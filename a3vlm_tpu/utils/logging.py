"""Metric logging (reference util/misc.py:47-62, 150-293):

- master-gated timestamped printing
- SmoothedValue / MetricLogger with windowed medians, iter/data timing and
  device-memory reporting. Under SPMD there is one controller process, so
  the reference's cross-rank ``all_reduce`` sync (misc.py:168-179) is a
  no-op; scalar metrics coming off the device are already globally reduced.
- TensorBoard + JSONL writers (main_finetune.py:299-303, 348-356).
"""

from __future__ import annotations

import builtins
import datetime
import json
import time
from collections import defaultdict, deque
from pathlib import Path
from typing import Iterable, Optional


def setup_print(is_master: bool = True, rank: int = 0) -> None:
    """Timestamped, master-gated print patch (misc.py:47-62)."""
    builtin_print = builtins.print

    def print_patched(*args, **kwargs):
        force = kwargs.pop("force", False)
        if is_master or force:
            now = datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S")
            builtin_print(f"[{now}] [rank {rank}]", *args, **kwargs)

    builtins.print = print_patched


class SmoothedValue:
    """Windowed median/avg tracker (misc.py:150-210)."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque: deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value, n: int = 1):
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self) -> float:
        d = sorted(self.deque)
        return d[len(d) // 2] if d else 0.0

    @property
    def avg(self) -> float:
        return sum(self.deque) / max(len(self.deque), 1)

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def max(self) -> float:
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(
            median=self.median,
            avg=self.avg,
            global_avg=self.global_avg,
            max=self.max,
            value=self.value,
        )


def _device_mem_gb() -> Optional[float]:
    try:
        import jax

        stats = jax.devices()[0].memory_stats()
        if stats and "peak_bytes_in_use" in stats:
            return stats["peak_bytes_in_use"] / 2**30
    except Exception:
        pass
    return None


class MetricLogger:
    """(misc.py:213-293)"""

    def __init__(self, delimiter: str = "  "):
        self.meters: dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            if v is None:
                continue
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self):
        return self.delimiter.join(
            f"{name}: {meter}" for name, meter in self.meters.items()
        )

    def log_every(
        self, iterable: Iterable, print_freq: int, header: str = "",
        total: Optional[int] = None,
    ):
        i = 0
        start_time = time.time()
        end = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        if total is None:
            total = len(iterable) if hasattr(iterable, "__len__") else None
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0:
                mem = _device_mem_gb()
                mem_str = f" mem: {mem:.2f}GB" if mem is not None else ""
                if total:
                    eta = iter_time.global_avg * (total - i)
                    eta_str = str(datetime.timedelta(seconds=int(eta)))
                    progress = f"[{i}/{total}] eta: {eta_str}"
                else:
                    progress = f"[{i}]"
                print(
                    f"{header} {progress} {self} time: {iter_time} "
                    f"data: {data_time}{mem_str}"
                )
            i += 1
            end = time.time()
        elapsed = str(datetime.timedelta(seconds=int(time.time() - start_time)))
        print(f"{header} Total time: {elapsed}")


class JsonlLogger:
    """Per-epoch log.txt JSON lines (main_finetune.py:348-356)."""

    def __init__(self, output_dir: str, filename: str = "log.txt"):
        Path(output_dir).mkdir(parents=True, exist_ok=True)
        self.path = Path(output_dir) / filename

    def write(self, record: dict) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")


def print_param_status(params, trainable_mask=None, max_rows: int = 0):
    """Parameter inventory dump (util/misc.py:641-658): name, shape, dtype,
    trainable flag, and totals."""
    import jax
    import numpy as np

    leaves = jax.tree_util.tree_leaves_with_path(params)
    mask_leaves = (
        jax.tree_util.tree_leaves(trainable_mask)
        if trainable_mask is not None
        else [True] * len(leaves)
    )
    total = 0
    trainable_total = 0
    for i, ((path, leaf), t) in enumerate(zip(leaves, mask_leaves)):
        n = int(np.prod(np.shape(leaf))) if np.ndim(leaf) else 1
        total += n
        if t:
            trainable_total += n
        if max_rows and i < max_rows:
            name = "/".join(
                str(getattr(p, "key", getattr(p, "idx", p))) for p in path
            )
            print(
                f"  {name}: shape={np.shape(leaf)} "
                f"dtype={getattr(leaf, 'dtype', '?')} trainable={bool(t)}"
            )
    print(
        f"parameters: {total:,} total, {trainable_total:,} trainable "
        f"({100 * trainable_total / max(total, 1):.1f}%)"
    )
    return total, trainable_total


class TensorBoardLogger:
    """SummaryWriter facade; no-op if tensorboard is unavailable."""

    def __init__(self, log_dir: str):
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._writer = SummaryWriter(log_dir=log_dir)
        except Exception:
            self._writer = None

    def add_scalar(self, tag: str, value, step: int) -> None:
        if self._writer is not None:
            self._writer.add_scalar(tag, value, step)

    def flush(self):
        if self._writer is not None:
            self._writer.flush()
