"""Data-layer tests: tokenizer segment semantics, conversation templating,
dialog dataset label alignment, alpaca dataset, type-homogeneous sampler,
transforms."""

import json

import numpy as np
import pytest
from PIL import Image

from a3vlm_tpu.data import transforms
from a3vlm_tpu.data.conversation import (
    ConversationGenerator,
    conv_v1_2,
    default_conversation,
)
from a3vlm_tpu.data.dialog import FinetuneDialogDataset, find_sublist
from a3vlm_tpu.data.sampler import FinetuneDistSampler
from a3vlm_tpu.data.system_prompt import format_prompt


# -- tokenizer ---------------------------------------------------------------


def test_tokenizer_roundtrip(tiny_tokenizer):
    ids = tiny_tokenizer.encode("Hi my darling", bos=True, eos=True)
    assert ids[0] == tiny_tokenizer.bos_id
    assert ids[-1] == tiny_tokenizer.eos_id
    text = tiny_tokenizer.decode(ids[1:-1])
    assert "darling" in text


def test_encode_segment_alignment(tiny_tokenizer):
    """encode_segment of a suffix must equal the corresponding slice of the
    full tokenization — the property label alignment relies on
    (tokenizer.py:90-112)."""
    full = tiny_tokenizer.encode("Hi my darling", bos=False, eos=False)
    seg = tiny_tokenizer.encode_segment("my darling")
    assert full[-len(seg):] == seg


# -- conversation ------------------------------------------------------------


def test_conversation_process_single_style():
    conv = conv_v1_2()
    conv.append_message("Human", "What is this?")
    conv.append_message("Assistant", "A door.")
    out = conv.process()
    assert out["conv"].startswith("A chat between a curious human")
    assert "### Human: What is this?\n###" in out["conv"]
    assert out["conv"].endswith("### Assistant: A door.\n###")
    assert out["to_predict"] == ["A door.\n###"]


def test_conversation_open_prompt():
    conv = conv_v1_2()
    conv.load_qas([["Question one?", None]])
    prompt = conv.get_prompt()
    assert prompt.endswith("### Assistant:")
    assert conv.response_end_signal == "\n###"


def test_conversation_generator_roles(tiny_tokenizer):
    gen = ConversationGenerator(tiny_tokenizer)
    conv, to_predict = gen.add_speaker_and_signal(
        [
            {"from": "human", "value": "Q1"},
            {"from": "gpt", "value": "A1"},
            {"from": "human", "value": "Q2"},
            {"from": "gpt", "value": "A2"},
        ]
    )
    assert to_predict == ["A1\n###", "A2\n###"]
    assert conv.count("### Human:") == 2


def test_find_sublist():
    assert find_sublist([1, 2, 3, 4], [3, 4]) == 2
    assert find_sublist([1, 2], [2, 3]) == -1


# -- dialog dataset ------------------------------------------------------------


@pytest.fixture()
def dialog_config(tmp_path):
    img = Image.new("RGB", (64, 48), (128, 30, 200))
    img_path = tmp_path / "img.png"
    img.save(img_path)
    records = [
        {
            "image": str(img_path),
            "conversations": [
                {"from": "human", "value": f"<image> Where is door {i}?"},
                {"from": "gpt", "value": f"<rb>revolute</rb>[0.1{i},0.20,0.30,0.40,0.00]"},
            ],
        }
        for i in range(8)
    ]
    task_json = tmp_path / "tasks.json"
    task_json.write_text(json.dumps(records))
    text_records = [
        {
            "conversations": [
                {"from": "human", "value": f"Say hi {i}"},
                {"from": "gpt", "value": f"hi {i}"},
            ]
        }
        for i in range(8)
    ]
    text_json = tmp_path / "text.json"
    text_json.write_text(json.dumps(text_records))
    cfg = tmp_path / "data.yaml"
    cfg.write_text(
        "META:\n"
        f" - path: {task_json}\n"
        "   type: image_text\n"
        f" - path: {text_json}\n"
        "   type: text\n"
    )
    return str(cfg)


def test_dialog_dataset_item(dialog_config, tiny_tokenizer):
    ds = FinetuneDialogDataset(
        dialog_config,
        transform=transforms.get_transform("padded_resize", 56),
        max_words=160,
        image_words=32,
        tokenizer=tiny_tokenizer,
    )
    assert len(ds) == 16
    assert set(ds.group_indices) == {"image_text", "text"}

    item = ds[0]
    assert item["examples"].shape == (128,)  # max_words - image_words
    assert item["image"].shape == (56, 56, 3)
    # labels nonzero exactly on the assistant span; those positions must
    # match the input tokens (the label-alignment contract, dataset.py:243)
    nz = item["labels"] != 0
    assert nz.any()
    np.testing.assert_array_equal(
        item["labels"][nz], item["examples"][nz]
    )
    # the prompt prefix is masked
    assert item["labels"][0] == 0
    # decoded label span contains the assistant answer
    ans = tiny_tokenizer.decode(item["labels"][nz].tolist())
    assert "revolute" in ans

    text_item = ds[ds.group_indices["text"][0]]
    assert "image" not in text_item
    assert text_item["examples"].shape == (160,)


def test_dialog_dataset_image_placeholder_stripped(
    dialog_config, tiny_tokenizer
):
    ds = FinetuneDialogDataset(
        dialog_config,
        transform=transforms.get_transform("padded_resize", 56),
        max_words=160,
        image_words=32,
        tokenizer=tiny_tokenizer,
    )
    item = ds[0]
    text = tiny_tokenizer.decode(
        item["examples"][item["examples"] != 0].tolist()
    )
    assert "<image>" not in text


def test_dialog_dataset_h5_cache(dialog_config, tiny_tokenizer):
    import os

    cwd = os.getcwd()
    try:
        os.chdir("/tmp")
        ds = FinetuneDialogDataset(
            dialog_config,
            transform=transforms.get_transform("padded_resize", 56),
            max_words=160,
            image_words=32,
            tokenizer=tiny_tokenizer,
            cache_on_disk=True,
            rank=0,
        )
        item = ds[0]
        assert item["examples"].shape == (128,)
    finally:
        os.chdir(cwd)


# -- alpaca -------------------------------------------------------------------


def test_alpaca_dataset(tmp_path, tiny_tokenizer):
    records = [
        {"instruction": f"Say number {i}", "input": "", "output": f"{i}"}
        for i in range(4)
    ]
    meta = tmp_path / "alpaca.json"
    meta.write_text(json.dumps(records))
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(f"META:\n - path: {meta}\n   type: text\n")

    from a3vlm_tpu.data.alpaca import FinetuneDataset

    ds = FinetuneDataset(
        str(cfg), transform=None, max_words=192, tokenizer=tiny_tokenizer
    )
    item = ds[0]
    assert item["examples"].shape == (192,)
    nz = item["labels"] != 0
    assert nz.any()
    np.testing.assert_array_equal(item["labels"][nz], item["examples"][nz])


def test_load_objaverse_point_cloud_reference_semantics(tmp_path):
    """Golden against transform.py:102-132: 9-dim column extraction,
    uint8-rgb /255, tile-up for small clouds, subsample for big ones,
    use_color=False slicing — and NO pc_norm (raw coordinates survive)."""
    from a3vlm_tpu.data.transforms import load_objaverse_point_cloud

    rng = np.random.default_rng(7)
    # 9-dim cloud: xyz | normals | rgb(uint8-scale) — keeps [0,1,2,6,7,8]
    pc9 = np.concatenate(
        [
            rng.uniform(-3, 3, (500, 3)),
            rng.uniform(-1, 1, (500, 3)),
            rng.uniform(0, 255, (500, 3)),
        ],
        axis=1,
    )
    p = tmp_path / "pc9.npy"
    np.save(p, pc9)
    out = load_objaverse_point_cloud(str(p), pointnum=8192)
    assert out.shape == (8192, 6)
    # rgb normalized to [0,1]; xyz NOT normalized (raw coords preserved)
    assert out[:, 3:].max() <= 1.0 and out[:, 3:].min() >= 0.0
    assert out[:, :3].max() > 1.5  # pc_norm would have shrunk to unit sphere
    # tile-up: 500 -> 8192 repeats the cloud; first 500 rows = extracted dims
    np.testing.assert_allclose(out[:500, :3], pc9[:500, :3])
    np.testing.assert_allclose(out[:500, 3:], pc9[:500, 6:9] / 255.0)
    np.testing.assert_allclose(out[500:1000], out[:500])

    # already-[0,1] rgb is NOT re-divided
    pc6 = np.concatenate(
        [rng.uniform(-3, 3, (100, 3)), rng.uniform(0, 1, (100, 3))], axis=1
    )
    p6 = tmp_path / "pc6.npy"
    np.save(p6, pc6)
    out6 = load_objaverse_point_cloud(str(p6), pointnum=200)
    np.testing.assert_allclose(out6[:100, 3:], pc6[:, 3:])

    # oversized cloud subsamples without replacement
    big = rng.uniform(0, 1, (300, 6))
    pb = tmp_path / "big.npy"
    np.save(pb, big)
    outb = load_objaverse_point_cloud(str(pb), pointnum=64)
    assert outb.shape == (64, 6)

    # use_color=False keeps xyz only
    outn = load_objaverse_point_cloud(str(pb), pointnum=64, use_color=False)
    assert outn.shape == (64, 3)


def test_finetune_dataset_point(tmp_path, tiny_tokenizer):
    """finetune_dataset_w_pointcloud.py:21 parity: META type "point" loads
    the cloud into the "image" slot and the per-modality image_words dict
    sets the text budget."""
    rng = np.random.default_rng(3)
    cloud = np.concatenate(
        [rng.uniform(-2, 2, (50, 3)), rng.uniform(0, 255, (50, 3))], axis=1
    )
    pc_path = tmp_path / "obj.npy"
    np.save(pc_path, cloud)
    records = [
        {
            "image": str(pc_path),
            "instruction": "Describe the object.",
            "input": "",
            "output": "a box",
        }
    ]
    meta = tmp_path / "point.json"
    meta.write_text(json.dumps(records))
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(f"META:\n - path: {meta}\n   type: point\n")

    from a3vlm_tpu.data.alpaca import FinetuneDataset

    ds = FinetuneDataset(
        str(cfg),
        transform=None,
        max_words=192,
        image_words={"point": 64},
        tokenizer=tiny_tokenizer,
    )
    item = ds[0]
    assert item["image"].shape == (8192, 6)
    assert item["image"].dtype == np.float32
    # max_words - image_words["point"] = 128 text slots
    assert item["examples"].shape == (128,)
    nz = item["labels"] != 0
    assert nz.any()
    np.testing.assert_array_equal(item["labels"][nz], item["examples"][nz])


def test_format_prompt_variants():
    no_input = format_prompt({"instruction": "do x", "input": ""})
    assert "### Input" not in no_input and "do x" in no_input
    with_input = format_prompt({"instruction": "do x", "input": "ctx"})
    assert "### Input:\nctx" in with_input
    assert format_prompt({"instruction": "q"}, "None") == "q"


# -- sampler ------------------------------------------------------------------


class _FakeDataset:
    def __init__(self, groups):
        self._groups = groups

    def groups(self):
        return [list(g) for g in self._groups]


def test_sampler_type_homogeneous_batches():
    groups = [list(range(0, 64)), list(range(64, 64 + 32))]
    bs, reps, acc = 4, 2, 2
    samplers = [
        FinetuneDistSampler(
            _FakeDataset(groups), num_replicas=reps, rank=r, batch_size=bs,
            acc_grad=acc, seed=1,
        )
        for r in range(reps)
    ]
    for s in samplers:
        s.set_epoch(0)
    all_indices = [list(iter(s)) for s in samplers]
    # every local batch of bs must come from one group
    for idx in all_indices:
        for i in range(0, len(idx), bs):
            batch = idx[i : i + bs]
            in_g0 = all(x < 64 for x in batch)
            in_g1 = all(x >= 64 for x in batch)
            assert in_g0 or in_g1
    # replicas partition the data
    assert not (set(all_indices[0]) & set(all_indices[1]))


def test_sampler_resume_start_iter():
    groups = [list(range(32))]
    s = FinetuneDistSampler(
        _FakeDataset(groups), num_replicas=1, rank=0, batch_size=4,
        shuffle=False,
    )
    full = list(iter(s))
    s.set_epoch(0, start_iter=3)
    resumed = list(iter(s))
    assert resumed == full[12:]


# -- transforms ----------------------------------------------------------------


def test_padded_resize_shape_and_norm():
    img = Image.new("RGB", (100, 50), (255, 255, 255))
    out = transforms.padded_resize(img, 224)
    assert out.shape == (224, 224, 3)
    # white pixels -> (1 - mean)/std
    want = (1.0 - transforms.CLIP_MEAN) / transforms.CLIP_STD
    np.testing.assert_allclose(out[112, 112], want, atol=1e-5)
    # padded rows at the top are the background color -> ~0 after norm
    np.testing.assert_allclose(out[10, 112], [0, 0, 0], atol=0.02)


def test_fps_and_pc_norm():
    rng = np.random.default_rng(0)
    pc = rng.uniform(-5, 5, (1000, 6)).astype(np.float32)
    sampled = transforms.farthest_point_sample(pc, 128)
    assert sampled.shape == (128, 6)
    normed = transforms.pc_norm(pc)
    assert np.max(np.linalg.norm(normed[:, :3], axis=1)) <= 1.0 + 1e-5


def test_loader_thread_workers_preserve_order_and_errors():
    """workers>0: batches are identical to the serial loader (order
    preserved) and item exceptions propagate to the consumer."""
    import numpy as np

    from a3vlm_tpu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            return {"x": np.full((3,), i, np.int32)}

    class Sampler:
        def __iter__(self):
            return iter(range(32))

        def __len__(self):
            return 32

        def set_epoch(self, *a):
            pass

    serial = [b["x"].copy() for b in DataLoader(DS(), Sampler(), 4)]
    threaded = [
        b["x"].copy() for b in DataLoader(DS(), Sampler(), 4, workers=3)
    ]
    assert len(serial) == len(threaded) == 8
    for a, b in zip(serial, threaded):
        np.testing.assert_array_equal(a, b)

    class BadDS(DS):
        def __getitem__(self, i):
            if i == 5:
                raise RuntimeError("boom")
            return super().__getitem__(i)

    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="boom"):
        list(DataLoader(BadDS(), Sampler(), 4, workers=2))
