"""Checkpoint / resume: a restored state must be bit-identical and resuming
sweeps from it must reproduce the uninterrupted run (SURVEY.md §5 — the
reference has no checkpointing; this is a new first-class subsystem)."""
import numpy as np
import pytest

import matrixproductbp_tpu as mp
from matrixproductbp_tpu.models import SIS, mpbp_sis


def _make_bp():
    rng = np.random.default_rng(3)
    g = mp.random_regular_graph(12, 3, rng)
    sis = SIS(g, lam=0.3, rho=0.2, T=3, gamma=0.3)
    bp = mpbp_sis(sis, D=6)
    bp = mp.bp_sweep(bp, mp.TruncBond(6))
    return bp


def test_save_load_roundtrip(tmp_path):
    bp = _make_bp()
    path = mp.save_checkpoint(str(tmp_path / "ckpt"), bp, step=7,
                              extra={"note": "hi"})
    bp2, meta = mp.load_checkpoint(path)
    assert meta["step"] == 7 and meta["extra"]["note"] == "hi"
    assert bp2.graph.N == bp.graph.N and bp2.graph.E == bp.graph.E
    for name in ("phi", "psi", "msg_cores", "msg_logz", "bel_cores",
                 "bel_logz", "f"):
        np.testing.assert_array_equal(np.asarray(getattr(bp, name)),
                                      np.asarray(getattr(bp2, name)))
    np.testing.assert_array_equal(np.asarray(bp.tables.Py),
                                  np.asarray(bp2.tables.Py))


def test_resume_matches_uninterrupted(tmp_path):
    bp = _make_bp()
    trunc = mp.TruncBond(6)

    # uninterrupted: 4 more sweeps
    ref = bp
    for _ in range(4):
        ref = mp.bp_sweep(ref, trunc)
    b_ref = np.asarray(mp.beliefs(ref))
    f_ref = float(mp.bethe_free_energy(ref))

    # interrupted at sweep 2, restored from disk, continued
    mid = mp.bp_sweep(mp.bp_sweep(bp, trunc), trunc)
    path = mp.save_checkpoint(str(tmp_path / "mid"), mid, step=2)
    res, _ = mp.load_checkpoint(path)
    for _ in range(2):
        res = mp.bp_sweep(res, trunc)
    assert np.allclose(b_ref, np.asarray(mp.beliefs(res)), atol=1e-12)
    assert np.isclose(f_ref, float(mp.bethe_free_energy(res)), atol=1e-12)


def test_manager_async_and_retention(tmp_path):
    bp = _make_bp()
    mgr = mp.CheckpointManager(str(tmp_path / "run"), keep=2)
    for it in range(5):
        mgr.save(it, bp, extra={"iter": it})
    mgr.wait()
    assert mgr.all_steps() == [3, 4]
    bp2, meta = mgr.restore()
    assert meta["step"] == 4 and meta["extra"]["iter"] == 4
    np.testing.assert_array_equal(np.asarray(bp.msg_cores),
                                  np.asarray(bp2.msg_cores))
    with pytest.raises(FileNotFoundError):
        mp.CheckpointManager(str(tmp_path / "empty")).restore()
