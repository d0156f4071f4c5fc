"""End-to-end slice tests: MetaModel API (generate/compute_logits/
evaluate_examples/stream_generate) on a tiny random ens5 model, and the eval
CLI over a demo-format task JSON."""

import json

import numpy as np
import pytest

from a3vlm_tpu.meta import MetaModel
from a3vlm_tpu.models import ens5 as ens5_mod


@pytest.fixture(scope="module")
def tiny_meta(tiny_tokenizer_dir):
    cfg = ens5_mod.tiny_ens5_config()
    model = MetaModel(
        llama_type="llama_ens5",
        tokenizer_path=tiny_tokenizer_dir,
        with_visual=True,
        max_seq_len=384,
        model_cfg=cfg,
    )
    return model


def test_meta_image_words(tiny_meta):
    assert tiny_meta.get_image_words() == tiny_meta.cfg.image_words
    assert tiny_meta.get_image_words() == (8 + 17 + 2) * 5


def test_generate_text_only(tiny_meta):
    out = tiny_meta.generate(
        ["Detect all manipulable object parts", "Say hi"],
        max_gen_len=8,
        temperature=0.0,
    )
    assert len(out) == 2
    assert all(isinstance(s, str) for s in out)


def test_generate_with_images(tiny_meta):
    cfg = tiny_meta.cfg
    images = np.zeros((2, cfg.image_size, cfg.image_size, 3), np.float32)
    out = tiny_meta.generate(
        ["What is this?", "Where is the door?"],
        images=images,
        max_gen_len=6,
        temperature=0.0,
    )
    assert len(out) == 2


def test_generate_stop_symbol(tiny_meta):
    """Stop symbols terminate generation and are trimmed (meta.py:439-477)."""
    out = tiny_meta.generate(
        ["hello"], max_gen_len=16, temperature=0.0,
        additional_stop_symbols=["###"],
    )
    assert "###" not in out[0]


def test_generate_rejects_str(tiny_meta):
    with pytest.raises(ValueError):
        tiny_meta.generate("not a list")


def test_compute_logits_and_evaluate(tiny_meta):
    logits = tiny_meta.compute_logits(["Say hi", "Say hi again longer"])
    assert len(logits) == 2
    # logits are trimmed to the TRUE vocab (the padded lanes are internal)
    assert logits[0].shape[-1] == tiny_meta.true_vocab
    assert tiny_meta.args.vocab_size % 128 == 0
    assert logits[0].shape[0] < logits[1].shape[0]

    res = tiny_meta.evaluate_examples(
        examples=["Say hi now", "Say hi later"],
        contexts=["Say hi", "Say hi"],
    )
    assert len(res["ppl"]) == 2
    assert all(np.isfinite(res["ppl"]))
    assert all(isinstance(m, bool) for m in res["max_equal"])


def test_stream_generate(tiny_meta):
    chunks = list(
        tiny_meta.stream_generate("Say hi", max_gen_len=6, temperature=0.0)
    )
    assert chunks[-1]["end_of_content"] is True
    assert all("text" in c for c in chunks)


def test_greedy_stream_matches_batch(tiny_meta):
    """stream_generate and generate agree under greedy decoding."""
    batch = tiny_meta.generate(["Say hi"], max_gen_len=6, temperature=0.0)[0]
    stream = list(
        tiny_meta.stream_generate("Say hi", max_gen_len=6, temperature=0.0)
    )[-1]["text"]
    assert stream.strip() == batch.strip()


def test_quantized_generate(tiny_tokenizer_dir):
    """int4 weight-only quantized decoder generates (the reference's NF4
    eval path); greedy output matches the dense model closely at tiny
    scale is NOT required — just validity + determinism."""
    cfg = ens5_mod.tiny_ens5_config()
    m = MetaModel(
        llama_type="llama_ens5",
        tokenizer_path=tiny_tokenizer_dir,
        with_visual=True,
        max_seq_len=384,
        model_cfg=cfg,
    )
    m.quantize(bits=4)
    out1 = m.generate(["hello"], max_gen_len=4, temperature=0.0)
    out2 = m.generate(["hello"], max_gen_len=4, temperature=0.0)
    assert out1 == out2
    assert isinstance(out1[0], str)
    from a3vlm_tpu.quant import QuantizedWeight

    assert isinstance(
        # generate() swaps the decoder to the per-layer decode layout
        m.params["llama"]["layers"][0]["attention"]["wq"]["weight"],
        QuantizedWeight,
    )


def test_generate_with_int8_kv_cache(tiny_tokenizer_dir):
    """MetaModel.kv_cache_bits = 8 generates deterministically through the
    QuantizedKV cache (serving extension)."""
    cfg = ens5_mod.tiny_ens5_config()
    m = MetaModel(
        llama_type="llama_ens5",
        tokenizer_path=tiny_tokenizer_dir,
        with_visual=True,
        max_seq_len=384,
        model_cfg=cfg,
    )
    m.kv_cache_bits = 8
    out1 = m.generate(["hello"], max_gen_len=4, temperature=0.0)
    out2 = m.generate(["hello"], max_gen_len=4, temperature=0.0)
    assert out1 == out2
    assert isinstance(out1[0], str)


def test_eval_cli_end_to_end(tmp_path, tiny_tokenizer_dir):
    """The parity-gate flow: demo-format task JSON -> eval CLI -> results
    JSON with the reference record schema (eval_affordance_v2.py:386-401)."""
    from PIL import Image

    from a3vlm_tpu import eval_affordance

    img_path = tmp_path / "demo.png"
    Image.new("RGB", (96, 64), (200, 100, 50)).save(img_path)
    demo = [
        {
            "image": str(img_path),
            "conversations": [
                {
                    "from": "human",
                    "value": "Detect all manipulable object parts and "
                    "provide their 3D bounding boxes.",
                },
                {"from": "gpt", "value": ""},
            ],
        }
    ] * 2
    task_json = tmp_path / "demo.json"
    task_json.write_text(json.dumps(demo))

    results_file = eval_affordance.main(
        [
            "--dataset", str(task_json),
            "--output_dir", str(tmp_path / "out"),
            "--tokenizer_path", tiny_tokenizer_dir,
            "--tiny_random_model",
            "--batch_size", "2",
            "--max_gen_len", "6",
            "--max_seq_len", "384",
            "--temperature", "0.0",
        ]
    )
    with open(results_file) as f:
        results = json.load(f)
    assert len(results) == 2
    for rec in results:
        assert set(rec) == {
            "answer", "format_answer", "annotation", "question", "image",
            "fail",
        }
        assert isinstance(rec["fail"], bool)


def test_vqa_dataset_npy_point_cloud(tmp_path):
    """Point-cloud task items (.npy image paths) render to a valid
    conditioning image (eval_affordance_with_quant.py:174-189 support)."""
    import numpy as np

    from a3vlm_tpu.eval_affordance import VQADataset

    rng = np.random.default_rng(0)
    pc = rng.uniform(-1, 1, (500, 6)).astype(np.float32)
    pc[:, 3:] = rng.uniform(0, 1, (500, 3))
    npy = tmp_path / "cloud.npy"
    np.save(npy, pc)
    task_json = tmp_path / "pc_tasks.json"
    task_json.write_text(json.dumps([
        {"image": str(npy), "conversations": [
            {"from": "human", "value": "Detect all manipulable object parts"},
            {"from": "gpt", "value": ""}]}
    ]))
    ds = VQADataset(str(task_json), input_size=64)
    item = ds[0]
    assert item["image"].shape == (64, 64, 3)
    assert np.isfinite(item["image"]).all()
    assert np.abs(item["image"]).sum() > 0


def test_eval_cli_model_parallel(tmp_path, tiny_tokenizer_dir):
    """--model_parallel_size 2: the eval CLI routes through ModelServer
    (params + cache sharded over the mesh) and produces the same record
    schema (the reference's torchrun MP eval, scripts/a3vlm_infer.sh)."""
    from PIL import Image

    from a3vlm_tpu import eval_affordance

    img_path = tmp_path / "demo.png"
    Image.new("RGB", (64, 64), (90, 120, 40)).save(img_path)
    demo = [
        {
            "image": str(img_path),
            "conversations": [
                {"from": "human",
                 "value": "What is the status of the door?"},
                {"from": "gpt", "value": ""},
            ],
        }
    ] * 2
    task_json = tmp_path / "demo.json"
    task_json.write_text(json.dumps(demo))

    results_file = eval_affordance.main(
        [
            "--dataset", str(task_json),
            "--output_dir", str(tmp_path / "out"),
            "--tokenizer_path", tiny_tokenizer_dir,
            "--tiny_random_model",
            "--model_parallel_size", "2",
            "--batch_size", "2",
            "--max_gen_len", "4",
            "--max_seq_len", "384",
            "--temperature", "0.0",
        ]
    )
    with open(results_file) as f:
        results = json.load(f)
    assert len(results) == 2 and all("answer" in r for r in results)


@pytest.mark.parametrize("extra", [[], ["--draft_k", "3"]])
def test_eval_cli_continuous_batching(tmp_path, tiny_tokenizer_dir, extra):
    """--continuous_batching: grouped per-image prefix reuse through the
    slot pool, same record schema; --draft_k adds prompt-lookup
    speculation on top (greedy)."""
    from PIL import Image

    from a3vlm_tpu import eval_affordance

    img_a = tmp_path / "a.png"
    img_b = tmp_path / "b.png"
    Image.new("RGB", (64, 64), (90, 120, 40)).save(img_a)
    Image.new("RGB", (64, 64), (10, 20, 200)).save(img_b)
    demo = []
    for img in (img_a, img_a, img_b):  # two questions share image a
        demo.append(
            {
                "image": str(img),
                "conversations": [
                    {"from": "human", "value": "What is the status?"},
                    {"from": "gpt", "value": ""},
                ],
            }
        )
    task_json = tmp_path / "demo.json"
    task_json.write_text(json.dumps(demo))

    results_file = eval_affordance.main(
        [
            "--dataset", str(task_json),
            "--output_dir", str(tmp_path / "out"),
            "--tokenizer_path", tiny_tokenizer_dir,
            "--tiny_random_model",
            "--continuous_batching",
            "--batch_size", "2",
            "--max_gen_len", "4",
            "--max_seq_len", "384",
            "--temperature", "0.0",
        ] + extra
    )
    with open(results_file) as f:
        results = json.load(f)
    assert len(results) == 3 and all("answer" in r for r in results)


def test_eval_cli_constrained(tmp_path, tiny_tokenizer_dir):
    """--constrained on a single_link_rec task: every answer must be a
    grammar-complete joint triad (zero fail flags even from a random
    model — the FSM makes malformed boxes impossible)."""
    from PIL import Image

    from a3vlm_tpu import eval_affordance

    img_path = tmp_path / "demo.png"
    Image.new("RGB", (64, 64), (90, 120, 40)).save(img_path)
    demo = [
        {
            "image": str(img_path),
            "conversations": [
                {"from": "human",
                 "value": "Please provide the joint's type and its 2D "
                          "rotated bounding box"},
                {"from": "gpt", "value": ""},
            ],
        }
    ] * 2
    task_json = tmp_path / "single_link_rec_tasks_Box.json"
    task_json.write_text(json.dumps(demo))

    results_file = eval_affordance.main(
        [
            "--dataset", str(task_json),
            "--output_dir", str(tmp_path / "out"),
            "--tokenizer_path", tiny_tokenizer_dir,
            "--tiny_random_model",
            "--constrained",
            "--batch_size", "2",
            "--max_gen_len", "64",
            "--max_seq_len", "448",
            "--temperature", "0.0",
        ]
    )
    with open(results_file) as f:
        results = json.load(f)
    assert len(results) == 2
    import re

    for r in results:
        # extract_answer strips the dots (reference behavior; repair
        # re-inserts decimals) — the recorded answer is digit/comma form
        assert re.fullmatch(
            r"<rb>(revolute|prismatic|fixed|continuous)</rb>"
            r"\[[0-9,\-]+\]", r["answer"].strip()
        ), r["answer"]
        # the repaired box parses to exactly 5 rotated-box values
        assert len(r["format_answer"]) == 5, r
