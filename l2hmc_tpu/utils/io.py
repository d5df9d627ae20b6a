"""Run-dir management, host-0-gated logging, metrics persistence.

Rebuild of ``utils/file_io.py:27-132`` + ``utils/tf_logging.py:4-86`` +
the tabular console logging of ``gauge_model.py:1104-1110,1207-1221``.
Metrics go to JSONL (one record per logged step) instead of pickles —
greppable, append-only, safe under preemption.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path
from typing import Dict, Iterable, Optional

import jax
import numpy as np


def is_primary() -> bool:
    return jax.process_index() == 0


def install_sigterm_handler():
    """Convert SIGTERM into KeyboardInterrupt so every training CLI falls
    through to its save-on-interrupt path.

    The reference only handles interactive interrupts
    (``gauge_model.py:1295-1301`` catches KeyboardInterrupt/SystemExit);
    a ``timeout``-killed run (the segmented-marathon pattern) sends SIGTERM
    and would lose the tail.  Installed by all train CLIs.
    """
    import signal

    def _sigterm(signum, frame):
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _sigterm)


def log(*args, **kwargs):
    """Host-0-gated print (``utils/file_io.py:27-38``)."""
    if is_primary():
        print(*args, **kwargs)
        sys.stdout.flush()


def make_run_dir(base: str | Path, prefix: str = "run") -> Path:
    """Create the next numbered run dir (``utils/file_io.py:75-108``)."""
    base = Path(base)
    base.mkdir(parents=True, exist_ok=True)
    existing = [
        int(p.name.split("_")[-1])
        for p in base.glob(f"{prefix}_*")
        if p.name.split("_")[-1].isdigit()
    ]
    nxt = max(existing, default=0) + 1
    run_dir = base / f"{prefix}_{nxt}"
    if is_primary():
        run_dir.mkdir(parents=True, exist_ok=True)
    return run_dir


def latest_run_dir(base: str | Path, prefix: str = "run") -> Path:
    """Highest-numbered existing run dir under ``base``."""
    base = Path(base)
    existing = [
        (int(p.name.split("_")[-1]), p)
        for p in base.glob(f"{prefix}_*")
        if p.name.split("_")[-1].isdigit()
    ]
    if not existing:
        raise FileNotFoundError(f"no {prefix}_* dirs under {base}")
    return max(existing)[1]


def save_params_json(run_dir: str | Path, params: dict):
    """Persist the run configuration (reference pickles ``params.pkl``,
    ``utils/file_io.py:65-72``; JSON here for greppability)."""
    if is_primary():
        (Path(run_dir) / "params.json").write_text(json.dumps(params, indent=2, default=str))


class MetricsLogger:
    """Tabular console + JSONL metrics writer.

    Prints the reference's training table (step, loss, t/step, accept,
    eps, beta, actions, plaqs, exact plaq, dQ, lr —
    ``gauge_model.py:1104-1110``) and appends every record to
    ``metrics.jsonl``.
    """

    COLUMNS = [
        ("step", "{:>7d}"),
        ("dt", "{:>8.3f}"),
        ("loss", "{:>12.4g}"),
        ("accept_prob", "{:>7.4f}"),
        ("eps", "{:>7.4f}"),
        ("beta", "{:>7.4f}"),
        ("actions", "{:>10.4g}"),
        ("plaqs", "{:>8.5f}"),
        ("plaq_exact", "{:>8.5f}"),
        ("dq", "{:>7.4f}"),
        ("lr", "{:>9.3g}"),
    ]

    def __init__(
        self,
        run_dir: Optional[str | Path] = None,
        print_every: int = 1,
        tensorboard: bool = False,
    ):
        self.run_dir = Path(run_dir) if run_dir else None
        self.print_every = print_every
        self._n = 0
        self._file = None
        self._tb = None
        if self.run_dir and is_primary():
            self.run_dir.mkdir(parents=True, exist_ok=True)
            self._file = open(self.run_dir / "metrics.jsonl", "a")
            if tensorboard:
                # scalar summaries per logged step — parity with the
                # reference's tf.summary writers (gauge_model.py:853-886)
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(str(self.run_dir / "tb"))
        self._header_printed = False

    def header(self):
        names = [name for name, _ in self.COLUMNS]
        line = " ".join(f"{n:>{len(fmt.format(0)) if 'd' in fmt else 8}}" for n, fmt in zip(names, (f for _, f in self.COLUMNS)))
        sep = "-" * len(line)
        log(line)
        log(sep)

    def write(self, record: Dict):
        """Record one logged step (floats/ints only)."""
        rec = {
            k: (float(v) if isinstance(v, (np.floating, float, jax.Array, np.ndarray)) else v)
            for k, v in record.items()
        }
        if self._file is not None:
            self._file.write(json.dumps(rec) + "\n")
            self._file.flush()
        if self._tb is not None and "step" in rec:
            for k, v in rec.items():
                if k != "step" and isinstance(v, (int, float)):
                    self._tb.add_scalar(k, v, int(rec["step"]))
        if self._n % self.print_every == 0:
            if not self._header_printed:
                self.header()
                self._header_printed = True
            parts = []
            for name, fmt in self.COLUMNS:
                if name in rec:
                    try:
                        parts.append(fmt.format(rec[name] if "d" not in fmt else int(rec[name])))
                    except (ValueError, TypeError):
                        parts.append(str(rec[name]))
            log(" ".join(parts))
        self._n += 1

    def write_summaries(self, step: int, tree, prefix: str = "params"):
        """Per-variable mean/std/min/max (+ TB histogram) summaries.

        Rebuild of ``utils/tf_logging.py:74-86`` (``variable_summaries``:
        mean/stddev/max/min/histogram per variable), which the reference
        attaches to every trainable variable and gradient
        (``gauge_model.py:858-886``).  Here: call with the params (or
        grads) pytree at logging steps; scalars land in ``metrics.jsonl``
        under ``{prefix}/{path}/{stat}`` and, when TensorBoard is on,
        as scalars + histograms.
        """
        stats = variable_summaries(tree, prefix)
        if self._file is not None:
            self._file.write(json.dumps({"step": int(step), **stats}) + "\n")
            self._file.flush()
        if self._tb is not None:
            for k, v in stats.items():
                self._tb.add_scalar(k, v, int(step))
            leaves = jax.tree_util.tree_leaves_with_path(tree)
            for path, leaf in leaves:
                name = f"{prefix}/{_path_str(path)}"
                self._tb.add_histogram(name, np.asarray(leaf).ravel(), int(step))

    def close(self):
        if self._file is not None:
            self._file.close()
        if self._tb is not None:
            self._tb.close()


def _path_str(path) -> str:
    return "/".join(
        str(getattr(p, "name", getattr(p, "key", getattr(p, "idx", p))))
        for p in path
    )


def variable_summaries(tree, prefix: str = "params") -> Dict[str, float]:
    """mean/std/min/max per pytree leaf (``utils/tf_logging.py:74-86``)."""
    out: Dict[str, float] = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        arr = np.asarray(leaf)
        name = f"{prefix}/{_path_str(path)}"
        out[f"{name}/mean"] = float(arr.mean())
        out[f"{name}/stddev"] = float(arr.std())
        out[f"{name}/min"] = float(arr.min())
        out[f"{name}/max"] = float(arr.max())
    return out
