import sys
import _bench_exp as b
from caelo_tpu.utils.compcache import enable_compilation_cache
enable_compilation_cache()
from caelo_tpu.config import PipelineConfig
import jax, time
print("devices:", jax.devices(), flush=True)
t=time.time(); b.run('f32-64-blocking-repo', PipelineConfig(), 64, False, reps=4)
print("total", time.time()-t, flush=True)
