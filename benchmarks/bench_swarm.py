import _bootstrap  # noqa: F401  (sys.path for checkout runs)
import numpy as np, time, jax
from safeopt_tpu import SafeOptSwarm
from safeopt_tpu.gp import GPRegression, RBF

rng = np.random.default_rng(0)
d = 10   # high-dimensional, the swarm's raison d'etre
n0 = 5
X = rng.uniform(-0.5, 0.5, size=(n0, d))
Y = (2.0*np.exp(-0.5*np.sum(X**2, axis=1)))[:, None]
gp = GPRegression(X, Y, RBF(d, variance=2.0, lengthscale=2.0), noise_var=0.01)
opt = SafeOptSwarm(gp, fmin=[0.0], bounds=[(-3.0, 3.0)]*d, swarm_size=20,
                   key=jax.random.key(0))
x = opt.optimize()  # warmup/compile
t0 = time.perf_counter()
iters = 5
for _ in range(iters):
    x = opt.optimize()
dt = (time.perf_counter()-t0)/iters
print(f"SafeOptSwarm optimize() in {d}D: {dt*1e3:.1f} ms/iter "
      f"(3 swarms x 101 fused fitness evals), |S|={len(opt.S)}")
