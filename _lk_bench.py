import time, numpy as np, jax, jax.numpy as jnp
from zenslam_tpu.ops.lk import build_lk_pyramid
from zenslam_tpu.ops.lk_pallas import lk_forward_backward_pallas, pyramidal_lk_pallas
rng = np.random.default_rng(0)
H, W = 384, 512
img0 = jnp.asarray(rng.random((H, W)).astype(np.float32))
img1 = jnp.roll(img0, (2, 3), (0, 1))
pyr0, sizes = build_lk_pyramid(img0, levels=4)
pyr1, _ = build_lk_pyramid(img1, levels=4)
N = 512
pts = jnp.asarray(np.stack([rng.uniform(30, W-30, N), rng.uniform(30, H-30, N)], -1).astype(np.float32))
valid = jnp.ones(N, bool)
out = lk_forward_backward_pallas(pyr0, pyr1, sizes, pts, valid)
jax.block_until_ready(out)
ts = []
for _ in range(20):
    t0 = time.perf_counter()
    out = lk_forward_backward_pallas(pyr0, pyr1, sizes, pts, valid)
    jax.block_until_ready(out)
    ts.append(time.perf_counter() - t0)
ok = np.asarray(out[1])
print(f"fwd+bwd N={N}: median {np.median(ts)*1e3:.2f} ms  min {min(ts)*1e3:.2f}  ok={ok.mean():.2f}")
out = pyramidal_lk_pallas(pyr0, pyr1, sizes, pts, valid)
jax.block_until_ready(out)
ts = []
for _ in range(20):
    t0 = time.perf_counter()
    out = pyramidal_lk_pallas(pyr0, pyr1, sizes, pts, valid)
    jax.block_until_ready(out)
    ts.append(time.perf_counter() - t0)
print(f"fwd only N={N}: median {np.median(ts)*1e3:.2f} ms  min {min(ts)*1e3:.2f}")
