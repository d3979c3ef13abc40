"""Checkpointing with the reference's latest/best semantics.

Reference contract (trainer.py:116-142): every epoch write `latest`, and
`best` whenever val mIoU improves; a checkpoint restores model, optimizer and
scheduler state plus the epoch counter and best mIoU.  Run directories are
named (checkpoints/pandaset_weighted, checkpoints/fusion_ablation_<type>).

Format here is flax msgpack (single self-contained file per checkpoint) —
the TPU-host-friendly analog of the torch pickle.  The scheduler needs no
state: it is a pure function of the step counter inside opt_state.
"""

from __future__ import annotations

import json
import os
import queue
import threading
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

LATEST = "latest.ckpt"
BEST = "best.ckpt"


def save_checkpoint(save_dir: str, state_dict: Dict[str, Any], epoch: int,
                    val_miou: float, is_best: bool = False,
                    snapshot: Optional[str] = None) -> None:
    """Write latest (+ best when is_best, + an immutable `snapshot` file
    when named — TrainConfig.snapshot_every) from one serialization."""
    os.makedirs(save_dir, exist_ok=True)
    payload = dict(state_dict)
    payload["epoch"] = np.int64(epoch)
    payload["val_miou"] = np.float64(val_miou)
    data = serialization.to_bytes(payload)
    _atomic_write(os.path.join(save_dir, LATEST), data)
    if is_best:
        _atomic_write(os.path.join(save_dir, BEST), data)
    if snapshot:
        _atomic_write(os.path.join(save_dir, snapshot), data)


def _atomic_write(path: str, data: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


class AsyncCheckpointer:
    """Overlap checkpoint D2H transfer, serialization and disk IO with
    training (the reference saves synchronously on the train thread,
    trainer.py:116-142; at TPU scale the save sits on the critical path
    between epochs, and over this host's relay the device_get alone is
    tens of ms).

    `save()` snapshots every device array with an on-device copy — an
    async dispatch that returns immediately and, crucially, decouples the
    snapshot from the trainer's DONATED state buffers (the next train step
    consumes `self.state`; the copies live until the writer is done with
    them) — then enqueues the snapshot for a single background thread that
    fetches it to host, serializes, and atomically writes latest/best.
    Writes are FIFO, so `latest.ckpt` always ends up at the newest epoch.

    Worker errors are sticky: they re-raise on the next `save()`/`wait()`.
    Call `wait()` before reading checkpoints back or ending the run, and
    `close()` when done with the checkpointer (Trainer.flush_checkpoints
    does both).

    The queue is bounded (maxsize=2): each pending save holds a full
    on-device copy of the train state, so an unbounded queue would let a
    slow disk accumulate snapshots in HBM until OOM; with backpressure,
    `save()` blocks once two snapshots are in flight.
    """

    def __init__(self) -> None:
        self._q: "queue.Queue" = queue.Queue(maxsize=2)
        self._error: Optional[BaseException] = None
        self._closed = False
        self._thread = threading.Thread(target=self._worker, daemon=True,
                                        name="lmsu-ckpt-writer")
        self._thread.start()

    @staticmethod
    def _snapshot_leaf(x):
        if isinstance(x, jax.Array):
            return jnp.copy(x)
        if isinstance(x, np.ndarray):
            return np.copy(x)
        return x

    def save(self, save_dir: str, state_dict: Dict[str, Any], epoch: int,
             val_miou: float, is_best: bool = False,
             snapshot: Optional[str] = None) -> None:
        self._raise_pending()
        if self._closed:
            raise RuntimeError("AsyncCheckpointer is closed")
        snap = jax.tree_util.tree_map(self._snapshot_leaf, state_dict)
        self._q.put((save_dir, snap, int(epoch), float(val_miou),
                     bool(is_best), snapshot))

    def wait(self) -> None:
        """Block until every enqueued checkpoint is durably on disk."""
        self._q.join()
        self._raise_pending()

    def close(self) -> None:
        """Drain pending writes, stop the worker thread, surface any sticky
        error. Idempotent; a closed checkpointer rejects further save()s."""
        if not self._closed:
            self._closed = True
            if self._thread.is_alive():
                self._q.put(None)  # shutdown sentinel
                self._thread.join()
        self._raise_pending()

    def _raise_pending(self) -> None:
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError("async checkpoint write failed") from err

    def _worker(self) -> None:
        while True:
            item = self._q.get()
            try:
                if item is None:
                    return
                save_dir, snap, epoch, val_miou, is_best, snapshot = item
                save_checkpoint(save_dir, jax.device_get(snap), epoch,
                                val_miou, is_best, snapshot=snapshot)
            except BaseException as e:  # surfaced on next save()/wait()
                self._error = e
            finally:
                self._q.task_done()


def load_checkpoint_raw(path: str) -> Dict[str, Any]:
    """Restore a checkpoint without a structure template (nested dicts of
    numpy arrays). Use for model-only consumers (inference, teacher load)
    that do not carry the optimizer state."""
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def load_model_variables(path: str) -> Dict[str, Any]:
    """Extract {'params', 'batch_stats'} flax variables from a trainer
    checkpoint, accepting both plain and KD ({'model','proj'}) layouts.

    Runs trained with TrainConfig.ema_decay selected their best checkpoint
    by EMA-weight validation, so the EMA shadow (when present) is what
    inference must load to reproduce the recorded val mIoU."""
    raw = load_checkpoint_raw(path)
    state = raw["state"]
    params = state.get("ema_params") or state["params"]
    if isinstance(params, dict) and set(params) == {"model", "proj"}:
        params = params["model"]
    return {"params": params, "batch_stats": state["batch_stats"]}


def load_checkpoint(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    """Restore a checkpoint into the structure of `template` (a state dict
    with the same pytree layout, e.g. from a freshly initialized trainer).
    Returns the template's structure plus 'epoch' and 'val_miou' leaves."""
    with open(path, "rb") as f:
        data = f.read()
    tpl = dict(template)
    tpl.setdefault("epoch", np.int64(0))
    tpl.setdefault("val_miou", np.float64(0.0))
    raw = serialization.msgpack_restore(data)
    st = raw.get("state")
    if isinstance(st, dict):
        tpl_ema = getattr(tpl.get("state"), "ema_params", None)
        if tpl_ema is None:
            # EMA-off trainer: drop any stored shadow (and tolerate
            # pre-EMA checkpoints that lack the key entirely).
            st["ema_params"] = None
        elif st.get("ema_params") is None:
            # EMA-on trainer resuming a pre-EMA / EMA-off checkpoint:
            # seed the shadow from the restored params (copies — the
            # donated train step forbids params/ema buffer aliasing).
            st["ema_params"] = jax.tree_util.tree_map(np.copy, st["params"])
    return serialization.from_state_dict(tpl, raw)


class HistoryWriter:
    """training_history.json with the exact reference schema
    (trainer.py:67-74,144-152): lists under train_loss / train_miou /
    val_loss / val_miou / lr, file rewritten whole each epoch."""

    KEYS = ("train_loss", "train_miou", "val_loss", "val_miou", "lr")

    def __init__(self, save_dir: str):
        os.makedirs(save_dir, exist_ok=True)
        self.path = os.path.join(save_dir, "training_history.json")
        self.history = {k: [] for k in self.KEYS}

    def append(self, train_loss: float, train_miou: float, val_loss: float,
               val_miou: float, lr: float) -> None:
        for k, v in zip(self.KEYS,
                        (train_loss, train_miou, val_loss, val_miou, lr)):
            self.history[k].append(float(v))
        with open(self.path, "w") as f:
            json.dump(self.history, f, indent=2)

    def load(self, truncate: Optional[int] = None) -> None:
        """Restore prior epochs so a resumed run appends instead of
        rewriting the file from scratch (the reference truncates history on
        resume — trainer.py:144-152 starts empty — which destroys the
        earlier curves; we keep them). truncate=N keeps only the first N
        entries, aligning the lists with the resumed epoch counter."""
        if os.path.exists(self.path):
            with open(self.path) as f:
                data = json.load(f)
            self.history = {k: list(data.get(k, []))[:truncate]
                            for k in self.KEYS}
