"""One-off probe: where do multi_step's extra ~0.3 ms/step go vs a bare
chained _step_impl? Times three variants on the real TPU:

  A. model.multi_step slope (bench methodology)
  B. bare lax.scan over _step_impl, diagnostics ignored entirely
  C. bare scan but carrying okmin = min(okmin, packed[10]) like multi_step

Usage: python scripts/probe_scan_overhead.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from dycoreplanet_tpu.base.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    import importlib.util

    spec = importlib.util.spec_from_file_location("graft", "__graft_entry__.py")
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)
    import bench

    model = graft._make_model("float32", shape=(32, 128, 256))
    dt = np.float32(0.002)
    state = bench._seed_state(model, model.initial_state())
    state, _, _ = model.multi_step(state, dt, 5, collect_diagnostics=False)

    cvals = model._const_values()

    @partial(jax.jit, static_argnums=2)
    def bare(s, cv, n):
        with model._bound_consts(cv):
            def body(carry, _):
                ns, _packed = model._step_impl(carry, jnp.float32(0.002))
                return ns, None
            out, _ = jax.lax.scan(body, s, None, length=n)
            return out

    @partial(jax.jit, static_argnums=2)
    def with_ok(s, cv, n):
        with model._bound_consts(cv):
            def body(carry, _):
                st, ok = carry
                ns, packed = model._step_impl(st, jnp.float32(0.002))
                return (ns, jnp.minimum(ok, packed[10])), None
            (out, ok), _ = jax.lax.scan(
                body, (s, jnp.float32(1.0)), None, length=n)
            return out

    def slope(fn, tag):
        def run(n):
            t0 = time.perf_counter()
            out = fn(state, cvals, n)
            float(jnp.sum(out.u[0]))
            return time.perf_counter() - t0
        run(5)
        t1 = min(run(5) for _ in range(3))
        t2 = min(run(45) for _ in range(3))
        ms = (t2 - t1) / 40 * 1e3
        print(f"{tag:20s} {ms:.3f} ms/step")
        return ms

    def slope_ms(tag):
        def run(n):
            t0 = time.perf_counter()
            s, _, _ = model.multi_step(state, dt, n,
                                       collect_diagnostics=False)
            float(jnp.sum(s.u[0]))
            return time.perf_counter() - t0
        run(5)
        t1 = min(run(5) for _ in range(3))
        t2 = min(run(45) for _ in range(3))
        ms = (t2 - t1) / 40 * 1e3
        print(f"{tag:20s} {ms:.3f} ms/step")

    jax.config.update("jax_default_matmul_precision", None)
    slope(bare, "bare_scan")
    slope(with_ok, "scan+okmin")
    slope_ms("multi_step")


if __name__ == "__main__":
    main()
