"""Checkpoint / resume of the BP state — orbax-style async saves.

The reference has no checkpointing at all (SURVEY.md §5: notebooks persist
results manually via JLD2).  For a production TPU deployment the BP fixed
point iteration is a long-running job whose whole state is the edge-message
tensor + beliefs + free-energy ledger, so we provide a first-class subsystem:

* ``save_checkpoint`` / ``load_checkpoint``: one atomic ``.npz`` per step
  holding every array leaf of the :class:`~matrixproductbp_tpu.bp.MPBP`
  pytree plus the (static) graph index arrays, so a checkpoint is fully
  self-describing — restore needs no builder code, only the package.
* ``CheckpointManager``: orbax-style manager with **async** saves (device
  arrays are fetched to host synchronously — cheap — and the file write
  happens on a background thread so sweeps continue immediately), retention
  of the last ``keep`` steps, and ``restore(step=None)`` → latest.

Writes are atomic (temp file + ``os.replace``) so a preempted job never sees
a torn checkpoint.
"""
from __future__ import annotations

import json
import os
import re
import threading

import jax
import numpy as np

from .bp import MPBP, GraphArrays
from .factors import RecursiveFactorTables
from .graph import Graph

__all__ = ["save_checkpoint", "load_checkpoint", "CheckpointManager"]

_FORMAT_VERSION = 1

_STATE_LEAVES = ("phi", "psi", "msg_cores", "msg_logz", "bel_cores",
                 "bel_logz", "f")
_TABLE_LEAVES = ("Py", "Pyp", "Pxy", "Pyy", "Py0")
_GRAPH_LEAVES = ("edge_src", "edge_dst", "rev_edge", "in_edges", "in_mask",
                 "nbr", "degree")


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)


def save_checkpoint(path: str, bp: MPBP, step: int = 0, extra: dict | None = None) -> str:
    """Serialize the full BP state to one ``.npz`` file (atomic).

    ``extra`` may carry user metadata (JSON-serializable) — e.g. the sweep
    count or convergence history.  Returns the final path.
    """
    arrays = {}
    for name in _STATE_LEAVES:
        arrays["state." + name] = _to_host(getattr(bp, name))
    for name in _TABLE_LEAVES:
        arrays["tables." + name] = _to_host(getattr(bp.tables, name))
    for name in _GRAPH_LEAVES:
        arrays["graph." + name] = np.asarray(getattr(bp.graph, name))
    meta = {
        "format_version": _FORMAT_VERSION,
        "step": int(step),
        "periodic": bool(bp.periodic),
        "graph.N": int(bp.graph.N),
        "graph.E": int(bp.graph.E),
        "graph.dmax": int(bp.graph.dmax),
        "graph.infinite": bool(bp.graph.infinite),
        "tables.yy_off": bp.tables.yy_off,
        "tables.ydims": (list(bp.tables.ydims)
                         if bp.tables.ydims is not None else None),
        "extra": extra or {},
    }
    arrays["meta"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8)
    if not path.endswith(".npz"):
        path = path + ".npz"
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, **arrays)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str, device=None):
    """Restore ``(bp, meta)`` from a checkpoint file.

    ``device``: optional ``jax.Device`` / ``Sharding`` to place the restored
    arrays on (default: JAX's default device).
    """
    import jax.numpy as jnp

    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"]).decode("utf-8"))
        if meta.get("format_version") != _FORMAT_VERSION:
            raise ValueError(
                f"unsupported checkpoint format {meta.get('format_version')}")
        graph = Graph(
            meta["graph.N"], meta["graph.E"], meta["graph.dmax"],
            *(z["graph." + n] for n in _GRAPH_LEAVES),
            infinite=meta.get("graph.infinite", False))
        ydims = meta.get("tables.ydims")
        tables = RecursiveFactorTables(
            *(jnp.asarray(z["tables." + n]) for n in _TABLE_LEAVES),
            meta.get("tables.yy_off"),
            tuple(ydims) if ydims is not None else None)
        state = {n: jnp.asarray(z["state." + n]) for n in _STATE_LEAVES}
    ga = GraphArrays(
        jnp.asarray(graph.in_edges), jnp.asarray(graph.out_edges),
        jnp.asarray(graph.in_mask), jnp.asarray(graph.degree))
    bp = MPBP(tables=tables, garrays=ga, graph=graph,
              periodic=meta["periodic"], **state)
    if device is not None:
        bp = jax.device_put(bp, device)
    return bp, meta


class CheckpointManager:
    """Directory of step-numbered checkpoints with async save + retention.

    >>> mgr = CheckpointManager(dir, keep=3)
    >>> for it in range(100):
    ...     bp = bp_sweep(bp, trunc)
    ...     mgr.save(it, bp)          # returns immediately; write is async
    >>> mgr.wait()                    # join the writer before exiting
    >>> bp, meta = mgr.restore()      # latest step
    """

    _PAT = re.compile(r"^ckpt_(\d+)\.npz$")

    def __init__(self, directory: str, keep: int = 3, async_save: bool = True):
        self.directory = directory
        self.keep = keep
        self.async_save = async_save
        self._thread: threading.Thread | None = None
        self._error: BaseException | None = None
        os.makedirs(directory, exist_ok=True)

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"ckpt_{step}.npz")

    def all_steps(self) -> list[int]:
        steps = []
        for name in os.listdir(self.directory):
            m = self._PAT.match(name)
            if m:
                steps.append(int(m.group(1)))
        return sorted(steps)

    def latest_step(self) -> int | None:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def save(self, step: int, bp: MPBP, extra: dict | None = None) -> None:
        """Snapshot ``bp`` at ``step``.  The device→host fetch happens here
        (synchronously, so the caller may keep mutating device state); the
        file write runs on a background thread when ``async_save``."""
        self.wait()  # one outstanding write at a time; surfaces prior errors
        host_bp = _to_host(bp)

        def _write():
            try:
                save_checkpoint(self._path(step), host_bp, step, extra)
                self._retain()
            except BaseException as e:  # surfaced on next save()/wait()
                self._error = e

        if self.async_save:
            self._thread = threading.Thread(target=_write, daemon=True)
            self._thread.start()
        else:
            _write()
            self._raise_pending()

    def _retain(self):
        steps = self.all_steps()
        for s in steps[:-self.keep] if self.keep else []:
            try:
                os.remove(self._path(s))
            except OSError:
                pass

    def _raise_pending(self):
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def wait(self) -> None:
        """Block until the outstanding async write (if any) completes."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        self._raise_pending()

    def restore(self, step: int | None = None, device=None):
        """Load ``(bp, meta)`` at ``step`` (default: the latest)."""
        self.wait()
        if step is None:
            step = self.latest_step()
            if step is None:
                raise FileNotFoundError(
                    f"no checkpoints in {self.directory}")
        return load_checkpoint(self._path(step), device=device)
