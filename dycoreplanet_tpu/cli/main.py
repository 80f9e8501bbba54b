"""Command-line entry point.

Equivalent of the reference's BoussinesqPlanet executable
(reference: source/main.cxx:20-159):

    python -m dycoreplanet_tpu -p parameters.prm

Same behaviors: ``-p`` parameter file (template auto-written + abort if
missing, main.cxx analogue of boussinesq_model_parameters.cc:32-42),
dispatch on space dimension x formulation (main.cxx:92-125), catch-all
error reporting (main.cxx:128-156), per-process hello
(main.cxx:71-86), dimensionless-number table, per-step diagnostics and
periodic timer summaries, VTK time-series output.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def print_parameter_info(params, model) -> None:
    """Dimensionless-number table (reference: print_paramter_info,
    boussinesq_model.tpp:1701-1776)."""
    from dycoreplanet_tpu.base import nondim

    ref = params.reference_quantities
    pc = params.physical_constants
    rows = [
        ("Reference velocity", f"{ref.velocity} m/s"),
        ("Reference length", f"{ref.length} m"),
        ("Reference time", f"{ref.time} s"),
        ("Reference temperature", f"{ref.temperature_ref} K"),
        ("Temperature change", f"{ref.temperature_change} K"),
        ("Reynolds number", f"{nondim.reynolds_number(ref.velocity, ref.length, pc.kinematic_viscosity):.6g}"),
        ("Peclet number", f"{nondim.peclet_number(ref.velocity, ref.length, pc.thermal_diffusivity):.6g}"),
        ("Rossby number", f"{nondim.rossby_number(ref.length, pc.omega, ref.velocity):.6g}"),
        ("Reference acceleration", f"{nondim.reference_acceleration(ref.length, ref.velocity):.6g}"),
        ("Grashoff number", f"{nondim.grashoff_number(params.space_dimension, pc.gravity_constant, pc.expansion_coefficient, ref.temperature_change, ref.length, pc.kinematic_viscosity):.6g}"),
        ("Prandtl number", f"{nondim.prandtl_number(pc.kinematic_viscosity, pc.thermal_diffusivity):.6g}"),
        ("Rayleigh number", f"{nondim.rayleigh_number(params.space_dimension, pc.gravity_constant, pc.expansion_coefficient, ref.temperature_change, ref.length, pc.kinematic_viscosity, pc.thermal_diffusivity):.6g}"),
        ("Geometry", model.geo.kind),
        ("Grid cells", " x ".join(str(n) for n in model.geo.cell_shape)),
        ("Formulation",
         ("FEEC mimetic (staggered C-grid)"
          if params.numerics.feec_formulation == "staggered"
          else "FEEC (rotational, coupled 3x3)")
         if params.use_FEEC_solver else "standard (advective)"),
        ("Time step", f"{params.time_step}"),
        ("Final time", f"{params.final_time}"),
    ]
    width = max(len(k) for k, _ in rows)
    print("+" + "-" * (width + 30) + "+")
    for k, v in rows:
        print(f"| {k.ljust(width)} : {v.ljust(25)} |")
    print("+" + "-" * (width + 30) + "+")


def main(argv=None) -> int:
    from dycoreplanet_tpu.base.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(
        prog="dycoreplanet_tpu",
        description="TPU-native rotating Boussinesq dynamical core",
    )
    parser.add_argument("-p", "--parameter-file", required=True,
                        help="deal.II-style .prm parameter file")
    parser.add_argument("--max-steps", type=int, default=None,
                        help="cap the number of time steps (debug)")
    parser.add_argument("--chunk", type=int, default=1,
                        help="production throughput mode: advance N steps "
                             "per on-device lax.scan (adaptive dt and NSE "
                             "sub-cycling run inside the scan; one "
                             "device->host pull per chunk instead of per "
                             "step)")
    parser.add_argument("--profile", default=None, metavar="DIR",
                        help="capture a jax.profiler trace of the run "
                             "into DIR (view with TensorBoard)")
    parser.add_argument("--write-mesh", action="store_true",
                        help="dump the mesh (volumes/diameters/shards) "
                             "to <output>/mesh.vts before running "
                             "(reference: write_mesh_vtu)")
    parser.add_argument("--no-output", action="store_true",
                        help="skip VTK output")
    parser.add_argument("--checkpoint-every", type=int, default=0,
                        help="write a checkpoint every N steps (0 = off)")
    parser.add_argument("--restart", default=None,
                        help="checkpoint file to resume from")
    args = parser.parse_args(argv)

    from dycoreplanet_tpu.base.params import Parameters
    from dycoreplanet_tpu.base.prm import ParameterFileError

    try:
        params = Parameters.from_file(args.parameter_file)
    except ParameterFileError as e:
        print(f"ERROR: {e}", file=sys.stderr)
        return 1

    try:
        # dispatch on dim x formulation; FEEC is 3D-only exactly like
        # the reference (main.cxx:92-125 throws for dim=2 + FEEC)
        if params.use_FEEC_solver and params.space_dimension == 2:
            raise ValueError(
                "FEEC solver untested in 2D. Aborting. "
                "(reference parity: source/main.cxx:100-104)")
        if params.use_direct_solver:
            raise ValueError(
                "no direct solver implemented. Aborting. "
                "(reference parity: boussinesq_model.tpp:1886-1894 throws)")
        return _run(params, args)
    except Exception as exc:  # reference main.cxx:128-156 catch-all
        print("----------------------------------------------------", file=sys.stderr)
        print(f"Exception on processing: {exc}\nAborting!", file=sys.stderr)
        return 1


def _run(params, args) -> int:
    import jax

    from dycoreplanet_tpu.diagnostics.timers import TimerRegistry
    from dycoreplanet_tpu.io.checkpoint import load_checkpoint, save_checkpoint
    from dycoreplanet_tpu.io.vtk import write_pvd, write_vts
    from dycoreplanet_tpu.models import make_model

    if params.hello_from_cluster:
        import socket

        for i, dev in enumerate(jax.devices()):
            print(f"Hello from {socket.gethostname()} device {i}: {dev.device_kind} ({dev.platform})")

    timers = TimerRegistry()
    with timers.scope("setup: geometry + model"):
        model = make_model(params)
    print_parameter_info(params, model)

    with timers.scope("setup: initial state"):
        if args.restart:
            state, meta = load_checkpoint(args.restart)
            print(f"Restarted from {args.restart} at step {int(state.step_number)}")
        else:
            state = model.initial_state()

    outdir = params.dirname_output
    os.makedirs(outdir, exist_ok=True)  # Tools::create_data_directory analogue
    if args.write_mesh:
        from dycoreplanet_tpu.io.vtk import write_mesh_vts
        from dycoreplanet_tpu.parallel.mesh import mesh_shape_for

        print("Writing mesh to", os.path.join(outdir, "mesh.vts"))
        write_mesh_vts(os.path.join(outdir, "mesh.vts"), model.geo,
                       shard_map_shape=mesh_shape_for(model.geo))
    pvd_entries = []

    def output(state, time_index: float, step: int) -> None:
        if args.no_output:
            return
        with timers.scope("output: vtk"):
            import jax.numpy as jnp

            # single fused device->host transfer: per-field pulls cost
            # seconds of flat latency each on tunneled TPU platforms
            dim = model.geo.dim
            cells = model.geo.cell_shape
            ncell = int(np.prod(cells))
            flat = np.asarray(jnp.concatenate([
                jnp.ravel(state.u), jnp.ravel(state.p), jnp.ravel(state.T)]))
            u = flat[:dim * ncell].reshape((dim,) + cells)
            p = flat[dim * ncell:(dim + 1) * ncell].reshape(cells)
            T = flat[(dim + 1) * ncell:].reshape(cells)
            # under the hydrostatic split the dynamic pressure excludes
            # the background; write the reference-comparable total too
            scalars = {"pressure": p, "temperature": T}
            if params.numerics.buoyancy == "perturbation":
                scalars["pressure_total"] = p + np.asarray(model.p_hydro)
            fname = f"{params.filename_output}_{step:06d}.vts"
            write_vts(
                os.path.join(outdir, fname),
                model.geo,
                scalars=scalars,
                vectors={"velocity": u},
            )
            pvd_entries.append({"time": time_index, "file": fname})
            write_pvd(os.path.join(outdir, f"{params.filename_output}.pvd"), pvd_entries)

    output(state, 0.0, 0)

    if args.profile:
        # jax.profiler device trace (SURVEY.md section 5: the TimerOutput
        # tables cover host-side phases; this captures on-chip timing)
        jax.profiler.start_trace(args.profile)

    if args.chunk > 1:
        rc = _run_chunked(params, args, model, state, timers, output)
        print("----------------------------------------")
        print(timers.summary())
        return rc

    dt = params.time_step
    time_index = 0.0
    n = 0
    while time_index <= params.final_time:
        if args.max_steps is not None and n >= args.max_steps:
            break
        print("----------------------------------------")
        print(f"Time step {n}:  t={time_index:.6g} -> t={time_index + dt:.6g}"
              f"  (dt={dt:.6g} | final time={params.final_time})")
        with timers.scope("step: NSE + temperature solve"):
            hists = None
            if params.solver_diagnostics_print_level >= 3:
                # per-iteration solver residual trails (the reference's
                # deallog histories at high 'solver diagnostics level',
                # main.cxx:89-90)
                state, diag, hists = model.step_verbose(state, dt)
            else:
                state, diag = model.step(state, dt)
            jax.block_until_ready(state.u)
        if hists:
            for name in sorted(hists):
                trail = np.asarray(hists[name])
                trail = trail[~np.isnan(trail)]
                txt = "  ".join(f"{r:.3e}" for r in trail)
                print(f"   [{name}] ||r|| trail ({trail.size} its): {txt}")
        print(f"   Max of local CFL numbers: {float(diag.cfl):.6g}")
        print(f"   Max velocity (dimensionless): {float(diag.max_velocity):.6g}")
        print(f"   Max velocity (with dimensions): "
              f"{float(diag.max_velocity) * params.reference_quantities.velocity:.6g} m/s")
        print(f"   Temperature range: [{float(diag.T_min):.6g}, {float(diag.T_max):.6g}]")
        print(f"   Solver iterations: helmholtz={list(np.asarray(diag.helmholtz_iters))} "
              f"poisson={int(diag.poisson_iters)} temperature={int(diag.temperature_iters)}")
        if params.solver_diagnostics_print_level >= 2:
            # inner-solver residual histories analogue (reference:
            # deallog depth from 'solver diagnostics level', main.cxx:89-90).
            # Negative residual = the "unchecked" sentinel (residual
            # check interval mode / spectral direct solve) — print it
            # as such, not as a nonsensical real residual (ADVICE r4).
            def _res(v):
                v = float(v)
                return "unchecked" if v < 0 else f"{v:.3e}"

            print(f"   Solver residuals: "
                  f"helmholtz={_res(diag.helmholtz_residual)} "
                  f"poisson={_res(diag.poisson_residual)} "
                  f"temperature={_res(diag.temperature_residual)}")
        print(f"   Post-projection max |div u|: {float(diag.div_norm):.3g}")

        time_index += dt / params.NSE_solver_interval
        n += 1
        output(state, time_index, n)

        if args.checkpoint_every and n % args.checkpoint_every == 0:
            with timers.scope("output: checkpoint"):
                save_checkpoint(
                    os.path.join(outdir, f"{params.filename_output}_ckpt_{n:06d}"),
                    state, {"time_index": time_index, "dt": dt})

        if params.adapt_time_step and n % params.NSE_solver_interval == 0:
            dt = model.compute_time_step(float(diag.cfl))
            print(f"   New time step (dimensionless): {dt:.6g}")
            print(f"   New time step (with dimensions): "
                  f"{dt * params.reference_quantities.time:.6g} s")

        if n % max(params.NSE_solver_interval, 10) == 0:
            print(timers.summary())

    print("----------------------------------------")
    print(timers.summary())
    return 0


def _run_chunked(params, args, model, state, timers, output) -> int:
    """Production throughput loop: ``--chunk N`` steps per on-device
    lax.scan (multi_step), with adaptive dt and NSE-interval
    sub-cycling carried INSIDE the scan — one packed device->host pull
    per chunk replaces the per-step sync of the reference-style loop."""
    import numpy as np

    from dycoreplanet_tpu.models.boussinesq import StepDiagnostics

    dt = params.time_step
    time_index = 0.0
    n = 0
    while time_index <= params.final_time:
        chunk = args.chunk
        if args.max_steps is not None:
            chunk = min(chunk, args.max_steps - n)
            if chunk <= 0:
                break
        with timers.scope("step: NSE + temperature solve (chunked)"):
            # multi_step internally retries the chunk with full CG if
            # any fixed-iteration solve missed tolerance (reference
            # NoConvergence retry semantics, tpp:1203-1232)
            state, packed, dt_out = model.multi_step(
                state, dt, chunk, collect_diagnostics=True,
                adaptive=params.adapt_time_step)
            rows = np.asarray(packed)   # ONE transfer for the chunk
        for j in range(chunk):
            d = StepDiagnostics(rows[j], model.geo.dim)
            print("----------------------------------------")
            print(f"Time step {n + j} "
                  f"(dt carried on device | final time={params.final_time})")
            print(f"   Max of local CFL numbers: {d.cfl:.6g}")
            print(f"   Max velocity (dimensionless): {d.max_velocity:.6g}")
            print(f"   Temperature range: [{d.T_min:.6g}, {d.T_max:.6g}]")
            print(f"   Post-projection max |div u|: {d.div_norm:.3g}")
        dt = float(dt_out)
        time_index = float(state.time)  # advanced exactly on device
        n += chunk
        output(state, time_index, n)
        if params.adapt_time_step:
            print(f"   New time step (dimensionless): {dt:.6g}")
        print(timers.summary())
    return 0
