"""Flagship economic workload (Ex_ENMPC) throughput on-chip.

The hardest example end-to-end: economic NMPC with ContForm quadrature
stage cost and MHE with the 'smooth' arrival-cost update.  Since round 4
the growing-horizon MHE warmup is traced too (masked fixed-shape window),
so the DEFAULT mode is chip-resident from step 0: one traced step —
smooth MHE (warmup or steady) + target NLP + OCP NLP + plant — scanned
over time and vmapped over scenario lanes.  ``ENMPC_WARM_HANDOFF=1``
measures the pre-round-4 mode (host warmup, traced steady continuation).

Usage: python tools/enmpc_onchip_bench.py [batch] [steps] [N] [N_mhe]

Lanes start from perturbed plant states — a throughput measurement, not a
scenario study.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from mpc_code_tpu.config import SolverOptions
    from mpc_code_tpu.estimators.mhe import make_mhe_traced
    from mpc_code_tpu.examples.enmpc import make_config
    from mpc_code_tpu.loop import ClosedLoop
    from mpc_code_tpu.loop.batched import init_carry, make_mpc_step
    from mpc_code_tpu.loop.schedules import make_step_inputs

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    N = int(sys.argv[3]) if len(sys.argv) > 3 else 25          # Ex_ENMPC.py N
    N_mhe = int(sys.argv[4]) if len(sys.argv) > 4 else 10      # Ex_ENMPC.py

    on_chip = jax.devices()[0].platform != "cpu"
    K0 = N_mhe + 2

    def mk(Nsim):
        cfg = make_config(Nsim=Nsim).replace(N=N)
        cfg.estimator.N_mhe = N_mhe
        if on_chip:
            # gauss_newton (default since round 5) engages the fused
            # Pallas ContForm joint sweep (rk4_quad_stage_hess_pallas):
            # chip A/B 60,108 vs 41,123 steps/s with identical
            # convergence (ok 32768/32768 both).  ENMPC_HESS=exact keeps
            # the Lagrangian curvature term (generic batch-major sweep).
            hess = os.environ.get("ENMPC_HESS", "gauss_newton")
            cfg = cfg.replace(sol_opts_ss=SolverOptions.for_f32(),
                              sol_opts_dyn=SolverOptions.for_f32(hessian=hess),
                              sol_opts_mhe=SolverOptions.for_f32())
        return cfg

    warm_handoff = os.environ.get("ENMPC_WARM_HANDOFF", "0") == "1"
    if warm_handoff:
        # pre-round-4 mode: host-driven growing-horizon warmup + handoff
        t0 = time.time()
        loop = ClosedLoop(mk(K0))
        loop.run()
        st = loop.final_state
        warmup_s = time.time() - t0
        cfg = mk(K0 + T)
        _, from_rt = make_mhe_traced(cfg, loop.model)
        carry1 = init_carry(cfg, mhe=from_rt(loop.mhe_rt, st["P"]), state=st)
        t_start, k_start = float(st["t"]), K0
    else:
        # round-4 default: chip-resident from step 0 — the traced step's
        # masked MHE window runs the growing-horizon warmup in-graph
        warmup_s = 0.0
        cfg = mk(K0 + T)
        carry1 = init_carry(cfg)
        t_start, k_start = 0.0, 0

    # tile the handoff carry across B lanes, perturb the plant state
    rng = np.random.default_rng(0)
    dx = 1e-3 * rng.standard_normal((B, cfg.nxp)).astype(np.float32)

    def tile(leaf):
        return jnp.tile(jnp.asarray(leaf)[None], (B,) + (1,) * jnp.ndim(leaf))

    carryB = jax.tree_util.tree_map(tile, carry1)
    carryB = carryB._replace(x=carryB.x + jnp.asarray(dx))

    step = make_mpc_step(cfg, batch_hint=B)
    n_steps = T if warm_handoff else K0 + T
    inputs = make_step_inputs(cfg, n_steps, t0=t_start, k0=k_start)
    vstep = jax.vmap(step, in_axes=(0, None))

    @jax.jit
    def run(c, inp):
        return jax.lax.scan(lambda cc, ii: vstep(cc, ii), c, inp)

    # persistent AOT artifact (utils/aot.py): a warm process skips the
    # ~60 s scan-graph trace; key covers the bench's shape-defining knobs
    from mpc_code_tpu.utils.aot import export_cached

    run = export_cached(
        run, f"enmpc-bench|warm={int(warm_handoff)}|N={N}|Nmhe={N_mhe}",
        jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
            (carryB, inputs)),
        verbose=True)

    t0 = time.time()
    carry_out, outs = run(carryB, inputs)
    np.asarray(carry_out.x)
    compile_s = time.time() - t0

    # measurement hygiene on the remote platform (both observed round 4):
    # (a) the timed call must not reuse the warmup call's exact input
    # buffers, and (b) block_until_ready can return without waiting —
    # fetch a VALUE (np.asarray) inside the timed region instead
    carryB2 = carryB._replace(x=carryB.x + jnp.float32(1e-4))
    t0 = time.time()
    carry_out, outs = run(carryB2, inputs)
    np.asarray(carry_out.x)
    run_s = time.time() - t0

    trace_dir = os.environ.get("ENMPC_TRACE")
    if trace_dir:
        # xprof capture of one full run (parse with
        # tools/trace_solve.py --parse <dir>) — round-5 VERDICT item 2:
        # name the ENMPC step's hot phases instead of suspecting them
        carryB3 = carryB._replace(x=carryB.x + jnp.float32(2e-4))
        with jax.profiler.trace(trace_dir):
            carry_t, _ = run(carryB3, inputs)
            np.asarray(carry_t.x)
        print(f"# trace -> {trace_dir}", file=sys.stderr)

    st_dyn = np.asarray(outs.status_dyn)
    lane_steps = B * n_steps
    mode = "warm-handoff steady-state" if warm_handoff else "from step 0 (traced warmup)"
    print(f"# warmup={warmup_s:.1f}s compile={compile_s:.1f}s run={run_s:.2f}s "
          f"B={B} steps={n_steps} N={N} N_mhe={N_mhe} "
          f"ok={(st_dyn != 2).sum()}/{st_dyn.size} "
          f"platform={jax.devices()[0].platform}", file=sys.stderr)
    print(f"ENMPC (smooth MHE + economic OCP) {mode} steps/s/chip: "
          f"{lane_steps / run_s:,.0f}")


if __name__ == "__main__":
    main()
