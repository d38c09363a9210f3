"""Profile the SGPN forward on TPU and dump a trace + per-op cost summary."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from or4d_tpu.config import DatasetConfig
from or4d_tpu.data.synthetic import make_scene_batch
from or4d_tpu.models import SGPN


def main():
    S = 4
    ds = DatasetConfig()
    batch = make_scene_batch(num_scenes=S, seed=0, n_objects=9, ds=ds, points_per_obj=2000)
    model = SGPN(num_classes=12, num_relations=15)
    variables = jax.jit(
        lambda b: model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, b, train=False)
    )(batch)
    fwd = jax.jit(lambda v, b: model.apply(v, b, train=False).rel_logprobs)
    fwd(variables, batch).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3):
        fwd(variables, batch).block_until_ready()
    print(f"steady: {(time.perf_counter()-t0)/3*1e3:.1f} ms for {S} scenes")

    jax.profiler.start_trace("/tmp/or4d_trace")
    fwd(variables, batch).block_until_ready()
    jax.profiler.stop_trace()
    print("trace written to /tmp/or4d_trace")


if __name__ == "__main__":
    main()
