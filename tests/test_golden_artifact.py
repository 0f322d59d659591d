"""Golden-artifact regression: the reference's EvaluationResults.mat.

BASELINE.md's regression bar comes from ``Evaluation Result/
EvaluationResults.mat`` (9x7 matrix, rows = keypoint x descriptor methods,
columns = RRE, stdRRE, RTE, stdRTE, success, inlier ratio, avg RANSAC
iters — per ``Evaluation Result/README.md`` and
``EvaluationOnRegistration.py:108-130``).  This test pins the loader and the
numbers our evaluation must eventually beat on real KITTI data.
"""
import os

import numpy as np
import pytest

MAT = "/root/reference/Evaluation Result/EvaluationResults.mat"

needs_mat = pytest.mark.skipif(not os.path.exists(MAT),
                               reason="reference artifact not present")


@needs_mat
def test_reference_golden_numbers():
    from scipy import io

    m = io.loadmat(MAT)["EvaluationResults"]
    assert m.shape == (9, 7)
    # row 0: CAE-LO keypoints x CAE-LO descriptors (BASELINE.md row 1)
    rre, std_rre, rte, std_rte, succ, inlier, iters = m[0]
    np.testing.assert_allclose(rre, 0.1781, atol=1e-4)
    np.testing.assert_allclose(rte, 0.0537, atol=1e-4)
    np.testing.assert_allclose(succ, 0.9980, atol=1e-4)
    np.testing.assert_allclose(inlier, 0.6572, atol=1e-3)
    np.testing.assert_allclose(iters, 100.8, atol=0.5)
    # best compound (USIP keypts x CAE-LO desc), row 6
    np.testing.assert_allclose(m[6][0], 0.1526, atol=1e-4)


@needs_mat
def test_summary_schema_matches_golden_columns():
    """Our registration_summary exposes the same quantities as the golden
    matrix columns (so a KITTI run is directly comparable)."""
    from caelo_tpu.eval.metrics import RegistrationErrors, registration_summary
    import jax.numpy as jnp

    errs = RegistrationErrors(
        rre_deg=jnp.asarray([0.1, 0.2]),
        rte_m=jnp.asarray([0.05, 0.06]),
        euler_err=jnp.zeros((2, 3)),
        t_err=jnp.zeros((2, 3)),
    )
    s = registration_summary(errs)
    for k in ("rre_deg", "rre_std", "rte_m", "rte_std", "success_rate"):
        assert k in s
