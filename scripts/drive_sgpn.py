import time
import jax, jax.numpy as jnp, numpy as np
from or4d_tpu.config import DatasetConfig
from or4d_tpu.data.synthetic import make_scene_batch
from or4d_tpu.data.augment import augment_batch
from or4d_tpu.models import SGPN, sgpn_loss
print("backend:", jax.default_backend())

ds = DatasetConfig()  # full paper shapes: 12 obj x 4000, 132 edges x 8000
t0 = time.perf_counter()
batch = make_scene_batch(num_scenes=1, seed=0, n_objects=9, ds=ds, points_per_obj=6000)
print(f"prep 1 scene host-side: {time.perf_counter()-t0:.2f}s; objs={int(batch.obj_mask.sum())} edges={int(batch.edge_mask.sum())}")

model = SGPN(num_classes=12, num_relations=15)
t0 = time.perf_counter()
variables = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch, train=False)
print(f"init: {time.perf_counter()-t0:.1f}s")
nparams = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
print(f"params: {nparams/1e6:.2f}M")

fwd = jax.jit(lambda v, b: model.apply(v, b, train=False))
t0 = time.perf_counter(); out = fwd(variables, batch); out.rel_logprobs.block_until_ready()
print(f"fwd compile+run: {time.perf_counter()-t0:.1f}s")
t0 = time.perf_counter()
for _ in range(5):
    fwd(variables, batch).rel_logprobs.block_until_ready()
dt = (time.perf_counter()-t0)/5
print(f"fwd steady: {dt*1e3:.1f} ms/scene -> {1/dt:.1f} scenes/sec (eval, 1 scene/batch)")

w = jnp.ones(12), jnp.ones(15)
def loss_fn(params, b):
    o, _ = model.apply({"params": params, **{k: v for k, v in variables.items() if k != "params"}}, b, train=True, rngs={"dropout": jax.random.key(2)}, mutable=["batch_stats"])
    return sgpn_loss(o, b, *w)[0]
step = jax.jit(jax.value_and_grad(loss_fn))
t0 = time.perf_counter(); l, g = step(variables["params"], batch); jax.block_until_ready(g)
print(f"train step compile+run: {time.perf_counter()-t0:.1f}s, loss={float(l):.4f}")
t0 = time.perf_counter()
for _ in range(3):
    jax.block_until_ready(step(variables["params"], batch))
print(f"train steady: {(time.perf_counter()-t0)/3*1e3:.1f} ms/scene")

aug = augment_batch(jax.random.key(5), batch)
print("augment on TPU ok:", aug.obj_points.shape)
