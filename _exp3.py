import json, time, sys
from caelo_tpu.utils.compcache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp, numpy as np
from caelo_tpu.config import PipelineConfig
from caelo_tpu.data.synthetic import make_scene, sample_scene_points, range_filter
from caelo_tpu.frontend.registration import extract_frame_features, register_pair
from caelo_tpu.models import weights_io
from caelo_tpu.ops.masking import pad_points
from caelo_tpu.parallel.pipeline import make_sequence_processor

cfg = PipelineConfig()
respond = weights_io.load_respond_layer_params()
encoder = weights_io.load_patch_encoder_params()
scene = make_scene(seed=0)
world = sample_scene_points(scene, seed=0, n_points=cfg.max_points)
rng = np.random.default_rng(0)
N = 64
scans = []
for i in range(N):
    t = np.array([1.2 * i, 0.05 * i, 0.0])
    local = range_filter((world - t).astype(np.float32), cfg.sensor)
    local = local + rng.normal(0, 0.005, local.shape).astype(np.float32)
    refl = rng.uniform(0, 1, (local.shape[0], 1)).astype(np.float32)
    pts, mask = pad_points(np.concatenate([local, refl], 1), cfg.max_points)
    scans.append((jnp.asarray(pts), jnp.asarray(mask)))
pts_b = jnp.stack([s for s, _ in scans]); mask_b = jnp.stack([m for _, m in scans])
process = make_sequence_processor(cfg)
t0=time.time(); feats, regs = process(respond, encoder, pts_b, mask_b, jax.random.key(0))
jax.block_until_ready(regs); print("warmup(block)", time.time()-t0, flush=True)
t0=time.time(); s=int(np.asarray(regs.success).sum()); print("warmup fetch", time.time()-t0, "nsucc", s, flush=True)
for r in range(3):
    t0=time.time()
    feats, regs = process(respond, encoder, pts_b, mask_b, jax.random.key(r+1))
    t1=time.time()
    jax.block_until_ready(regs)
    t2=time.time()
    v=float(np.asarray(regs.t).sum())
    t3=time.time()
    print(f"rep {r}: dispatch {t1-t0:.4f}s block {t2-t1:.4f}s fetch {t3-t2:.4f}s", flush=True)
