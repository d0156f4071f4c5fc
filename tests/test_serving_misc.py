"""Tests for the serving facade, layer-wise LR scaling, PlainBoxFormatter,
and the metric logging utilities."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_model_server_generate(tiny_tokenizer_dir, devices8):
    from a3vlm_tpu.meta import MetaModel
    from a3vlm_tpu.models import ens5 as ens5_mod
    from a3vlm_tpu.serving import ModelServer

    m = MetaModel(
        llama_type="llama_ens5",
        tokenizer_path=tiny_tokenizer_dir,
        with_visual=True,
        max_seq_len=384,
        model_cfg=ens5_mod.tiny_ens5_config(),
    )
    server = ModelServer(meta_model=m, model_parallel_size=2)
    out = server.generate(["hi", "there"], max_gen_len=4, temperature=0.0)
    assert len(out) == 2
    # params got TP-sharded onto the mesh
    # generate() swaps the decoder to the per-layer decode layout
    wq = m.params["llama"]["layers"][0]["attention"]["wq"]["weight"]
    assert len(wq.sharding.device_set) == 8
    logits = server.compute_logits(["hi"])
    assert logits[0].shape[-1] == m.true_vocab


def test_layerwise_scale_tree():
    from a3vlm_tpu.config import ModelArgs
    from a3vlm_tpu.models import llama
    from a3vlm_tpu.train.param_groups import (
        layerwise_scale_tree,
        scale_updates_by,
    )

    tiny = ModelArgs(dim=16, n_layers=4, n_heads=2, n_kv_heads=2,
                     vocab_size=32, multiple_of=8, max_seq_len=16)
    params = llama.init_llama_params(jax.random.PRNGKey(0), tiny)
    scales = layerwise_scale_tree(params, layer_decay=0.5)
    wq_scale = np.asarray(
        scales["layers"]["attention"]["wq"]["weight"]
    ).reshape(-1)
    # deeper layers get larger scales: decay^(L-1-l)
    np.testing.assert_allclose(wq_scale, [0.125, 0.25, 0.5, 1.0])
    assert float(scales["norm"]["weight"]) == 1.0

    tx = scale_updates_by(scales)
    updates = jax.tree_util.tree_map(jnp.ones_like, params)
    scaled, _ = tx.update(updates, tx.init(params))
    got = np.asarray(scaled["layers"]["attention"]["wq"]["weight"])
    np.testing.assert_allclose(got[0], 0.125)
    np.testing.assert_allclose(got[3], 1.0)


def test_plain_box_formatter_roundtrip():
    from a3vlm_tpu.codecs.bbox_util import (
        BoxFormatProcess,
        PlainBoxFormatter,
        denorm_bboxes,
    )

    fmt = PlainBoxFormatter()
    s = fmt.format_box([[0.1, 0.2, 0.3, 0.4], [0.5, 0.6, 0.7, 0.8]])
    assert s == "[0.100,0.200,0.300,0.400;0.500,0.600,0.700,0.800]"
    extracted = fmt.extract(f"the boxes are {s} ok")
    assert extracted == [[[0.1, 0.2, 0.3, 0.4], [0.5, 0.6, 0.7, 0.8]]]

    proc = BoxFormatProcess(fmt)
    sentence = {"value": "find <boxes> now", "boxes_seq": [[1, 0]]}
    target = {"boxes": [[10, 20, 30, 40], [50, 60, 70, 80]],
              "width": 100, "height": 100}
    out, _ = proc(sentence, target)
    assert out["value"] == (
        "find [0.500,0.600,0.700,0.800;0.100,0.200,0.300,0.400] now"
    )
    assert out["raw_value"] == "find <boxes> now"

    assert denorm_bboxes(100, 200, [0.1, 0.2, 0.3, 0.4]) == [10, 40, 30, 80]


def test_metric_logger_and_smoothed_value(capsys):
    from a3vlm_tpu.utils.logging import JsonlLogger, MetricLogger, SmoothedValue

    sv = SmoothedValue(window_size=3)
    for v in [1.0, 2.0, 3.0, 4.0]:
        sv.update(v)
    assert sv.median == 3.0
    assert sv.avg == 3.0
    assert sv.global_avg == 2.5
    assert sv.max == 4.0 and sv.value == 4.0

    ml = MetricLogger()
    for i, _ in enumerate(ml.log_every(range(5), print_freq=2, header="T")):
        ml.update(loss=float(i))
    out = capsys.readouterr().out
    assert "T" in out and "loss" in out and "Total time" in out

    import json as _json
    import tempfile

    d = tempfile.mkdtemp()
    jl = JsonlLogger(d)
    jl.write({"epoch": 0, "loss": 1.5})
    with open(jl.path) as f:
        assert _json.loads(f.readline()) == {"epoch": 0, "loss": 1.5}
