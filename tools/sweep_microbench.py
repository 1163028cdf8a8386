"""Chip microbenchmark of the dynamics derivative-sweep implementations.

The sweep (value + Jacobians of the Mx-substep RK4 rollout at all B*N
scenario-stage points) is ~76% of the bench iteration wall (round-4/5
traces).  This tool times the three implementations IN ISOLATION on the
CSTR bench dynamics so layout/kernel work iterates in seconds instead of
full-solver compiles:

  jacfwd : batch-major vmap(vmap(jacfwd)) — the round-4 production path
           at large batches
  lanes  : lanes-minor custom_vmap rule (ops/integrators.rk4_stage_jac)
  pallas : fused Pallas kernel (ops/sweep_pallas.py)

Usage: python tools/sweep_microbench.py [impls] [--batch B] [--n N]
  impls: comma list of jacfwd,lanes,pallas (default all)

Measurement hygiene (BASELINE.md round-4): inputs are perturbed between
reps and a value is fetched inside the timed region.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("impls", nargs="?", default="jacfwd,lanes,pallas")
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--check", action="store_true",
                    help="compare implementations numerically")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("BENCH_CACHE", "/tmp/mpc_tpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from mpc_code_tpu.examples.nmpc import model_fxm

    B, N, Mx = args.batch, args.n, 10
    nx, nu, nd = 3, 2, 2
    clip_lo = jnp.asarray([0.0, 280.0, 0.4], jnp.float32)
    clip_hi = jnp.asarray([2.0, 420.0, 1.0], jnp.float32)

    def _ode(xx, tt, uu, dd, pp):
        lo = clip_lo[:, None] if jnp.ndim(xx) == 2 else clip_lo
        hi = clip_hi[:, None] if jnp.ndim(xx) == 2 else clip_hi
        return model_fxm(jnp.clip(xx, lo, hi), uu, dd, tt, pp)

    def _ode_raw(xx, tt, uu, dd, pp):
        # pallas path: the clip guard is applied in-kernel from scalar
        # literals (sweep_pallas._make_clip), f gets the raw ODE
        return model_fxm(xx, uu, dd, tt, pp)

    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.uniform([0.3, 318.0, 0.55], [0.95, 340.0, 0.70],
                                 size=(B, N, nx)).astype(np.float32))
    us = jnp.asarray(rng.uniform([295.0, 0.0], [305.0, 0.25],
                                 size=(B, N, nu)).astype(np.float32))
    pxs = jnp.zeros((B, N, nx), jnp.float32)
    t = jnp.zeros((B,), jnp.float32)
    h = jnp.full((B,), 0.2, jnp.float32)
    d = jnp.tile(jnp.asarray([0.0, 0.1], jnp.float32), (B, 1))

    fns = {}

    if "jacfwd" in args.impls or args.check:
        def _substep(xv, uv, tv, dt, dd, px):
            k1 = _ode(xv, tv, uv, dd, px)
            k2 = _ode(xv + dt / 2 * k1, tv + dt / 2, uv, dd, px)
            k3 = _ode(xv + dt / 2 * k2, tv + dt / 2, uv, dd, px)
            k4 = _ode(xv + dt * k3, tv + dt, uv, dd, px)
            return xv + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)

        def _one_jac(x, u, px, t0, h0, dd):
            z = jnp.concatenate([x, u])

            def roll(zz):
                xf = zz[:nx]
                dt = h0 / Mx
                tv = t0
                for _ in range(Mx):
                    xf = _substep(xf, zz[nx:], tv, dt, dd, px)
                    tv = tv + dt
                return xf, xf

            J, xf = jax.jacfwd(roll, has_aux=True)(z)
            return xf, J[:, :nx], J[:, nx:]

        v1 = jax.vmap(_one_jac, in_axes=(0, 0, 0, None, None, None))
        fns["jacfwd"] = jax.jit(jax.vmap(
            v1, in_axes=(0, 0, 0, 0, 0, 0)))

    if "lanes" in args.impls:
        from mpc_code_tpu.ops.integrators import rk4_stage_jac
        sj = rk4_stage_jac(_ode, Mx)
        fns["lanes"] = jax.jit(jax.vmap(sj, in_axes=(0, 0, 0, 0, 0, 0)))

    if "pallas" in args.impls:
        from mpc_code_tpu.ops.sweep_pallas import rk4_stage_jac_pallas
        fns["pallas"] = jax.jit(rk4_stage_jac_pallas(
            _ode_raw, Mx, clip_lo=np.asarray(clip_lo),
            clip_hi=np.asarray(clip_hi)))

    if args.check:
        ref = None
        for name in ["jacfwd"] + [k for k in fns if k != "jacfwd"]:
            out = jax.tree_util.tree_map(
                np.asarray, fns[name](xs, us, pxs, t, h, d))
            if ref is None:
                ref = out
                continue
            errs = [float(np.max(np.abs(a - b) / (1e-3 + np.abs(b))))
                    for a, b in zip(out, ref)]
            print(f"# {name} vs jacfwd rel err: xf={errs[0]:.2e} "
                  f"Jx={errs[1]:.2e} Ju={errs[2]:.2e}")

    for name in args.impls.split(","):
        if name not in fns:
            continue
        fn = fns[name]
        t0 = time.time()
        out = fn(xs, us, pxs, t, h, d)
        np.asarray(out[0])
        compile_s = time.time() - t0
        times = []
        for r in range(args.reps):
            xs_r = xs + np.float32(1e-6 * (r + 1))
            t0 = time.time()
            out = fn(xs_r, us, pxs, t, h, d)
            np.asarray(out[0][0, 0])
            times.append(time.time() - t0)
        ms = sorted(times)
        print(f"{name:8s} compile={compile_s:6.1f}s  "
              f"best={ms[0]*1e3:8.2f}ms  med={ms[len(ms)//2]*1e3:8.2f}ms  "
              f"(B={B}, N={N}, Mx={Mx})")


if __name__ == "__main__":
    main()
