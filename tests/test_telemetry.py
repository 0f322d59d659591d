import json

import numpy as np

from caelo_tpu.utils.telemetry import MetricsLog, StageTimer, trace


def test_stage_timer():
    t = StageTimer(sync=False)
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and s["b"]["count"] == 1
    assert json.loads(t.report())["a"]["mean_ms"] >= 0


def test_metrics_log(tmp_path):
    log = MetricsLog(str(tmp_path / "run.jsonl"))
    log.log("pair", frame=3, inliers=np.int32(42), rre=np.float32(0.1))
    log.log("pair", frame=4, inliers=7, rre=0.2)
    recs = log.read()
    assert len(recs) == 2
    assert recs[0]["inliers"] == 42 and isinstance(recs[0]["inliers"], int)


def test_trace_annotation_noop():
    import jax.numpy as jnp

    with trace(None, "unit"):
        x = jnp.ones(4).sum()
    assert float(x) == 4.0
