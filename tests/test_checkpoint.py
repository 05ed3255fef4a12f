"""Checkpoint/resume: a run interrupted + restored must continue identically."""

import numpy as np

from lidp_tpu.models import lj_melt
from lidp_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def test_roundtrip(tmp_path):
    melt = lj_melt.build(scale=1)
    sys, res, nlist, istate = melt.runner.setup(melt.system)
    sys, res, nlist, istate = melt.runner.run(sys, res, nlist, istate, 5)

    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, sys, istate=None)
    sys2, _, _ = load_checkpoint(path, melt.system)

    np.testing.assert_array_equal(np.asarray(sys2.x), np.asarray(sys.x))
    np.testing.assert_array_equal(np.asarray(sys2.v), np.asarray(sys.v))
    assert int(sys2.step) == 5

    # continue both and compare
    resA = melt.runner.setup(sys)      # rebuild forces from restored state
    resB = melt.runner.setup(sys2)
    a = melt.runner.run(*resA, 3)
    b = melt.runner.run(*resB, 3)
    np.testing.assert_allclose(np.asarray(a[0].x), np.asarray(b[0].x),
                               rtol=0, atol=0)
