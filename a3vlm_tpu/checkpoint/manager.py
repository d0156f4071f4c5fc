"""Checkpoint/resume subsystem (reference util/misc.py:324-569 +
util/tensor_parallel.py save/load, rebuilt on Orbax):

- one sharding-aware Orbax save per checkpoint instead of per-MP-rank
  ``consolidated.XX-of-YY`` torch files: Orbax records the global array and
  restores onto ANY mesh/sharding, which subsumes the reference's TP
  merge/split resharder (tensor_parallel.py:83-161) and the FSDP
  FULL_STATE_DICT gathering (misc.py:392-406).
- ``only_save_trainable`` delta-style saves (misc.py:347-353) via a
  trainable-mask filter.
- sidecar metadata: config.json, meta.json (llama_type), tokenizer — saved
  exactly like misc.py:366-386 so checkpoints remain self-describing.
- epoch/iter directory naming + latest-checkpoint discovery
  (misc.py:440-464).
- 2-stage resume semantics (misc.py:466-569): ``restore_params`` (stage 1,
  model only) and ``restore_train_state`` (stage 2: optimizer/step/dataset
  state).
"""

from __future__ import annotations

import json
import os
import re
from pathlib import Path
from typing import Any, Optional

import jax


def _ckpt_name(epoch: int, it: Optional[int] = None) -> str:
    # misc.py naming: epoch_X or epoch_X-iter_Y (in-epoch saves)
    return f"epoch_{epoch}" if it is None else f"epoch_{epoch}-iter_{it}"


_CKPT_RE = re.compile(r"^epoch_(\d+)(?:-iter_(\d+))?$")


def find_latest_checkpoint(output_dir: str) -> Optional[str]:
    """Latest-checkpoint discovery (misc.py:440-464): highest epoch, then
    highest iter (a full epoch save beats in-epoch saves of that epoch)."""
    if not os.path.isdir(output_dir):
        return None
    best = None
    for name in os.listdir(output_dir):
        m = _CKPT_RE.match(name)
        if not m or not (Path(output_dir) / name / "_DONE").exists():
            continue
        epoch = int(m.group(1))
        it = int(m.group(2)) if m.group(2) else None
        key = (epoch, it is None, it or 0)
        if best is None or key > best[0]:
            best = (key, name)
    return str(Path(output_dir) / best[1]) if best else None


class CheckpointManager:
    def __init__(self, output_dir: str):
        self.output_dir = Path(output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)

    # -- save ----------------------------------------------------------------

    def save(
        self,
        epoch: int,
        it: Optional[int] = None,
        *,
        params: Any,
        opt_state: Any = None,
        step: Any = None,
        dataset_state: Optional[dict] = None,
        tokenizer=None,
        llama_type: Optional[str] = None,
        llama_config: Optional[dict] = None,
        trainable_mask: Optional[Any] = None,
        extra: Optional[dict] = None,
        wait: bool = True,
    ) -> str:
        """``wait=False`` makes the save ASYNC: orbax's device-to-host copy
        + write proceed while training continues (a 13B save otherwise
        blocks the loop for the whole write). The ``_DONE`` marker is only
        touched once the write really finished — on the next save, or an
        explicit ``wait_until_finished()`` (called at train end). Resume
        never sees a torn checkpoint: ``latest()`` requires ``_DONE``."""
        import orbax.checkpoint as ocp

        self.wait_until_finished()
        ckpt_dir = self.output_dir / _ckpt_name(epoch, it)
        ckpt_dir.mkdir(parents=True, exist_ok=True)

        if trainable_mask is not None:
            # only_save_trainable (misc.py:347-353): frozen leaves dropped
            params = _filter_by_mask(params, trainable_mask)

        # one checkpointer per artifact; orbax saves finalize (temp-dir
        # rename) only on wait_until_finished — the sync path waits here,
        # the async path defers to the next save / explicit barrier
        pending = []

        def _save(path, tree):
            c = ocp.StandardCheckpointer()
            c.save(path, tree, force=True)
            pending.append(c)

        _save((ckpt_dir / "model").absolute(), params)
        if opt_state is not None:
            _save((ckpt_dir / "optimizer").absolute(), opt_state)
        other = {
            "epoch": epoch,
            "iter": it if it is not None else 0,
            "step": int(step) if step is not None else 0,
        }
        if extra:
            other.update(extra)
        with open(ckpt_dir / "other.json", "w") as f:
            json.dump(other, f)
        if dataset_state is not None:
            with open(ckpt_dir / "dataset_state.json", "w") as f:
                json.dump(dataset_state, f)
        # self-describing sidecars (misc.py:366-386)
        if llama_config is not None:
            with open(ckpt_dir / "config.json", "w") as f:
                json.dump(llama_config, f)
        if llama_type is not None:
            with open(ckpt_dir / "meta.json", "w") as f:
                json.dump({"llama_type": llama_type}, f)
        if tokenizer is not None:
            tokenizer.save(str(ckpt_dir))
        if wait:
            for c in pending:
                c.wait_until_finished()
            (ckpt_dir / "_DONE").touch()
        else:
            self._pending = (pending, ckpt_dir)
        return str(ckpt_dir)

    def wait_until_finished(self) -> None:
        """Finalize an outstanding async save (write barrier + _DONE)."""
        outstanding = getattr(self, "_pending", None)
        if outstanding is not None:
            checkpointers, ckpt_dir = outstanding
            for c in checkpointers:
                c.wait_until_finished()
            (ckpt_dir / "_DONE").touch()
            self._pending = None

    # -- restore ---------------------------------------------------------------

    def restore_params(self, ckpt_dir: str, abstract_params: Any) -> Any:
        """Stage-1 resume (misc.py:466-497): model weights only, restored
        onto the target sharding (pass sharded abstract arrays /
        jax.ShapeDtypeStructs as ``abstract_params``). Partial checkpoints
        (only_save_trainable) merge over the provided tree."""
        import orbax.checkpoint as ocp

        checkpointer = ocp.StandardCheckpointer()
        path = (Path(ckpt_dir) / "model").absolute()
        try:
            restored = checkpointer.restore(path, abstract_params)
        except (ValueError, KeyError):
            # partial (trainable-only) checkpoint with a different tree:
            # restore what exists and merge into the provided tree
            restored = ocp.PyTreeCheckpointer().restore(str(path))
        # trainable-only saves store None for frozen leaves; fall back to the
        # caller-provided values there (misc.py:347-353 delta semantics)
        return _merge_partial(abstract_params, restored)

    def restore_train_state(
        self, ckpt_dir: str, abstract_opt_state: Any = None
    ) -> dict:
        """Stage-2 resume (misc.py:499-569): optimizer state + counters +
        dataset state."""
        import orbax.checkpoint as ocp

        out: dict = {}
        opt_path = Path(ckpt_dir) / "optimizer"
        if abstract_opt_state is not None and opt_path.exists():
            out["opt_state"] = ocp.StandardCheckpointer().restore(
                opt_path.absolute(), abstract_opt_state
            )
        with open(Path(ckpt_dir) / "other.json") as f:
            out.update(json.load(f))
        ds_path = Path(ckpt_dir) / "dataset_state.json"
        if ds_path.exists():
            with open(ds_path) as f:
                out["dataset_state"] = json.load(f)
        return out


def restore_raw_checkpoint(ckpt_dir: str) -> Any:
    """Restore a checkpoint's model tree WITHOUT an abstract template — for
    consuming trainable-only (adapter) checkpoints whose shape the caller
    doesn't know up front (LoRA rank, which dense leaves trained). Frozen
    leaves come back as ``None`` holes (``_filter_by_mask``); the reference
    analogue is loading an ``only_save_trainable`` delta
    (util/misc.py:347-353)."""
    import orbax.checkpoint as ocp

    path = (Path(ckpt_dir) / "model").absolute()
    return ocp.PyTreeCheckpointer().restore(str(path))


def _filter_by_mask(tree, mask):
    return jax.tree_util.tree_map(
        lambda p, m: p if m else None, tree, mask,
        is_leaf=lambda x: x is None,
    )


def _merge_partial(base, partial):
    def pick(b, p):
        return b if p is None else p

    return jax.tree_util.tree_map(
        pick, base, partial, is_leaf=lambda x: x is None
    )
