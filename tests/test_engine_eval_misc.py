"""Coverage for engine failure semantics, in-epoch saves, and eval resume
dedup."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from a3vlm_tpu.train.engine import train_one_epoch


class _Loader:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __iter__(self):
        for i in range(self.n):
            yield {"i": i}


def test_engine_nan_abort():
    """Non-finite loss aborts (engine_finetune.py:56-58)."""

    def bad_step(state, batch):
        return state, {"loss": jnp.float32(float("nan")),
                       "grad_norm": jnp.float32(0)}

    with pytest.raises(FloatingPointError):
        train_one_epoch(
            bad_step, None, _Loader(3), epoch=0, lr=1e-4, min_lr=0,
            warmup_epochs=0, epochs=1,
        )


def test_engine_in_epoch_saves():
    """save_fn fires every save_iteration_interval, not at epoch end
    (engine_finetune.py:93-100)."""
    saves = []

    def step(state, batch):
        return (state or 0) + 1, {"loss": jnp.float32(1.0),
                                  "grad_norm": jnp.float32(0.5)}

    state, stats = train_one_epoch(
        step, 0, _Loader(7), epoch=0, lr=1e-4, min_lr=0, warmup_epochs=0,
        epochs=1, save_fn=lambda s, e, it: saves.append((e, it)),
        save_iteration_interval=3,
    )
    assert saves == [(0, 3), (0, 6)]
    assert state == 7
    assert "closs" in stats


def test_eval_resume_dedup(tmp_path):
    """Already-answered (image, question) pairs are skipped
    (eval_affordance_v2.py:121-130)."""
    from PIL import Image

    from a3vlm_tpu.eval_affordance import VQADataset

    img = tmp_path / "a.png"
    Image.new("RGB", (32, 32)).save(img)
    tasks = [
        {"image": str(img), "conversations": [
            {"from": "human", "value": f"question {i}"},
            {"from": "gpt", "value": ""}]}
        for i in range(4)
    ]
    tj = tmp_path / "t.json"
    tj.write_text(json.dumps(tasks))

    existing = [{"image": str(img), "question": "question 1"},
                {"image": str(img), "question": "question 3"}]
    ds = VQADataset(str(tj), input_size=32, existing_results=existing)
    assert len(ds) == 2
    remaining = {ds[i]["question"] for i in range(2)}
    assert remaining == {"question 0", "question 2"}


def test_vqa_dataset_sampling_cap(tmp_path):
    from PIL import Image

    from a3vlm_tpu.eval_affordance import VQADataset

    img = tmp_path / "a.png"
    Image.new("RGB", (16, 16)).save(img)
    tasks = [
        {"image": str(img), "conversations": [
            {"from": "human", "value": f"q{i}"},
            {"from": "gpt", "value": ""}]}
        for i in range(20)
    ]
    tj = tmp_path / "t.json"
    tj.write_text(json.dumps(tasks))
    ds = VQADataset(str(tj), input_size=16, max_samples=5)
    assert len(ds) == 5
