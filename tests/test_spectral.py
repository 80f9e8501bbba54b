"""Spectral Poisson solver tests: exactness of the direct solvers and
convergence of the shell spectral-CG against the weak Laplacian."""

import jax.numpy as jnp
import numpy as np
import pytest

from dycoreplanet_tpu.grid import make_annulus, make_cuboid, make_shell
from dycoreplanet_tpu.ops.bc import BC, BCSpec
from dycoreplanet_tpu.ops import stencil as st
from dycoreplanet_tpu.solvers.spectral import (
    AnnulusPoissonDirect,
    CuboidPoissonDirect,
    ShellPoissonSpectral,
)

NEU = BCSpec(BC.NEUMANN, BC.NEUMANN)


def _mean_free(x):
    return x - jnp.mean(x)


class TestCuboidDirect:
    def test_exact_inverse(self):
        g = make_cuboid(8, 12, 16)
        specs = [NEU, None, None]
        solver = CuboidPoissonDirect(g, dtype=jnp.float64)
        rng = np.random.RandomState(0)
        x_true = _mean_free(jnp.asarray(rng.randn(*g.cell_shape)))
        b = -st.weak_laplacian(g, x_true, specs)
        x = _mean_free(solver(b))
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_true), atol=1e-10)

    def test_f32_accuracy(self):
        g = make_cuboid(8, 16, 16)
        specs = [NEU, None, None]
        solver = CuboidPoissonDirect(g, dtype=jnp.float32)
        rng = np.random.RandomState(1)
        x_true = _mean_free(jnp.asarray(rng.randn(*g.cell_shape), dtype=jnp.float32))
        b = -st.weak_laplacian(g, x_true, specs)
        x = _mean_free(solver(b))
        assert float(jnp.max(jnp.abs(x - x_true))) < 1e-4


class TestAnnulusDirect:
    def test_exact_inverse(self):
        g = make_annulus(16, 48, 1.0, 3.0)
        specs = [NEU, None]
        solver = AnnulusPoissonDirect(g, dtype=jnp.float64)
        rng = np.random.RandomState(2)
        x_true = _mean_free(jnp.asarray(rng.randn(*g.cell_shape)))
        b = -st.weak_laplacian(g, x_true, specs)
        x = _mean_free(solver(b))
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_true), atol=1e-10)

    def test_thin_production_annulus(self):
        # aqua_planet.prm regime: r in [637.1, 647.1] — extreme aspect
        g = make_annulus(16, 192, 637.1, 647.1)
        specs = [NEU, None]
        solver = AnnulusPoissonDirect(g, dtype=jnp.float64)
        rng = np.random.RandomState(3)
        x_true = _mean_free(jnp.asarray(rng.randn(*g.cell_shape)))
        b = -st.weak_laplacian(g, x_true, specs)
        x = _mean_free(solver(b))
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_true), atol=1e-8)


class TestShellSpectral:
    def test_converges_to_truth(self):
        g = make_shell(8, 16, 32, 1.0, 3.0)
        specs = [NEU, BCSpec(BC.POLE, BC.POLE), None]
        solver = ShellPoissonSpectral(g, dtype=jnp.float64, rtol=1e-11, maxiter=300)
        rng = np.random.RandomState(4)
        x_true = _mean_free(jnp.asarray(rng.randn(*g.cell_shape)))
        b = -st.weak_laplacian(g, x_true, specs)
        x = _mean_free(solver(b))
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_true), atol=1e-7)

    def test_spectral_operator_matches_weak_laplacian(self):
        # A_k applied mode-by-mode must equal FFT(-weak_lap) exactly
        g = make_shell(4, 8, 16, 1.0, 3.0)
        specs = [NEU, BCSpec(BC.POLE, BC.POLE), None]
        solver = ShellPoissonSpectral(g, dtype=jnp.float64)
        rng = np.random.RandomState(5)
        x = jnp.asarray(rng.randn(*g.cell_shape))
        lhs = -st.weak_laplacian(g, x, specs)
        xh = jnp.fft.rfft(x, axis=2)
        xs = jnp.concatenate([xh.real, xh.imag], axis=2)
        axs = solver._apply(xs)
        nm = solver.nm
        ah = axs[:, :, :nm] + 1j * axs[:, :, nm:]
        rhs = jnp.fft.irfft(ah, n=g.cell_shape[2], axis=2)
        # remove the k=0 deflation term: a uniform constant
        # defl_scale * sum(x) / nlon added to every cell
        corr = float(solver._defl_scale) * float(jnp.sum(x)) / g.cell_shape[2]
        diff = np.array(rhs - lhs) - corr
        np.testing.assert_allclose(diff, 0.0, atol=1e-9)


class TestShellPoissonDirect:
    """Exact eigentransform shell solver vs the CG variant and vs the
    operator residual (spectral.py ShellPoissonDirect)."""

    def test_matches_cg_and_operator(self):
        import jax.numpy as jnp
        from dycoreplanet_tpu.grid import factory
        from dycoreplanet_tpu.ops import stencil as st
        from dycoreplanet_tpu.ops.bc import BC, BCSpec
        from dycoreplanet_tpu.solvers.spectral import (
            ShellPoissonDirect, ShellPoissonSpectral)

        g = factory.make_shell(8, 16, 32, 1.0, 3.0)
        specs = [BCSpec(BC.NEUMANN, BC.NEUMANN),
                 BCSpec(BC.POLE, BC.POLE), None]
        rng = np.random.RandomState(0)
        b = jnp.asarray(rng.randn(8, 16, 32))
        b = b - jnp.mean(b)
        xd, it_d = ShellPoissonDirect(g, dtype=jnp.float64).solve(b)
        xc, _ = ShellPoissonSpectral(g, dtype=jnp.float64, rtol=1e-12,
                                     maxiter=2000).solve(b)
        xd = xd - jnp.mean(xd)
        xc = xc - jnp.mean(xc)
        assert int(it_d) == 0  # direct
        np.testing.assert_allclose(np.asarray(xd), np.asarray(xc),
                                   rtol=0, atol=1e-10)
        r = b - (-st.weak_laplacian(g, xd, specs))
        r = r - jnp.mean(r)
        assert float(jnp.max(jnp.abs(r))) < 1e-12

    def test_selected_for_uniform_radial_shell(self):
        import jax.numpy as jnp
        from dycoreplanet_tpu.grid import factory
        from dycoreplanet_tpu.solvers.spectral import (
            ShellPoissonFastDiag, make_poisson_solver)

        g = factory.make_shell(4, 8, 16, 1.0, 3.0)
        s = make_poisson_solver(g, dtype=jnp.float64)
        assert isinstance(s, ShellPoissonFastDiag)


class TestShellPoissonFastDiag:
    """Full fast-diagonalization shell solver (three matmul transform
    pairs, no FFT/Thomas): exactness vs the weak Laplacian and
    agreement with ShellPoissonDirect."""

    def test_exact_inverse(self):
        import jax.numpy as jnp
        from dycoreplanet_tpu.grid import factory
        from dycoreplanet_tpu.ops import stencil as st
        from dycoreplanet_tpu.ops.bc import BC, BCSpec
        from dycoreplanet_tpu.solvers.spectral import ShellPoissonFastDiag

        g = factory.make_shell(8, 16, 32, 1.0, 3.0)
        specs = [BCSpec(BC.NEUMANN, BC.NEUMANN),
                 BCSpec(BC.POLE, BC.POLE), None]
        rng = np.random.RandomState(7)
        x_true = jnp.asarray(rng.randn(8, 16, 32))
        x_true = x_true - jnp.mean(x_true)
        b = -st.weak_laplacian(g, x_true, specs)
        solver = ShellPoissonFastDiag(g, dtype=jnp.float64)
        x, iters = solver.solve(b)
        x = x - jnp.mean(x)
        vol = jnp.asarray(np.broadcast_to(g.vol, g.cell_shape))
        x = x - jnp.sum(x * vol) / jnp.sum(vol) \
            + jnp.sum(x_true * vol) / jnp.sum(vol)
        assert int(iters) == 0
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_true),
                                   rtol=0, atol=1e-9)

    def test_matches_direct(self):
        import jax.numpy as jnp
        from dycoreplanet_tpu.grid import factory
        from dycoreplanet_tpu.solvers.spectral import (
            ShellPoissonDirect, ShellPoissonFastDiag)

        g = factory.make_shell(6, 12, 24, 1.0, 3.0)
        rng = np.random.RandomState(8)
        b = jnp.asarray(rng.randn(6, 12, 24))
        b = b - jnp.mean(b)
        xf, _ = ShellPoissonFastDiag(g, dtype=jnp.float64).solve(b)
        xd, _ = ShellPoissonDirect(g, dtype=jnp.float64).solve(b)
        xf = xf - jnp.mean(xf)
        xd = xd - jnp.mean(xd)
        np.testing.assert_allclose(np.asarray(xf), np.asarray(xd),
                                   rtol=0, atol=1e-9)

    def test_f32_accuracy(self):
        import jax.numpy as jnp
        from dycoreplanet_tpu.grid import factory
        from dycoreplanet_tpu.ops import stencil as st
        from dycoreplanet_tpu.ops.bc import BC, BCSpec
        from dycoreplanet_tpu.solvers.spectral import ShellPoissonFastDiag

        g = factory.make_shell(16, 32, 64, 1.0, 3.0)
        specs = [BCSpec(BC.NEUMANN, BC.NEUMANN),
                 BCSpec(BC.POLE, BC.POLE), None]
        rng = np.random.RandomState(9)
        x_true = jnp.asarray(rng.randn(16, 32, 64), dtype=jnp.float32)
        x_true = x_true - jnp.mean(x_true)
        b = -st.weak_laplacian(g, x_true, specs)
        solver = ShellPoissonFastDiag(g, dtype=jnp.float32)
        x, _ = solver.solve(b)
        vol = jnp.asarray(np.broadcast_to(g.vol, g.cell_shape),
                          jnp.float32)
        x = x - jnp.sum(x * vol) / jnp.sum(vol) \
            + jnp.sum(x_true * vol) / jnp.sum(vol)
        assert float(jnp.max(jnp.abs(x - x_true))) < 5e-4

    def test_precision_modes(self):
        """"high" / "high-refine" MXU pass modes (params.numerics
        `poisson precision`): on CPU the precision enum is a no-op so
        "high" must match "highest" bitwise-closely, and "high-refine"
        (one exact-stencil refinement pass) must land at least as close
        to the exact solution. On TPU the same asserts bound the bf16x3
        error (refine measured ~1.6e-7 rel; PERF.md)."""
        import jax.numpy as jnp
        from dycoreplanet_tpu.grid import factory
        from dycoreplanet_tpu.ops import stencil as st
        from dycoreplanet_tpu.ops.bc import BC, BCSpec
        from dycoreplanet_tpu.solvers.spectral import ShellPoissonFastDiag

        g = factory.make_shell(16, 32, 64, 1.0, 3.0)
        specs = [BCSpec(BC.NEUMANN, BC.NEUMANN),
                 BCSpec(BC.POLE, BC.POLE), None]
        rng = np.random.RandomState(12)
        x_true = jnp.asarray(rng.randn(16, 32, 64), dtype=jnp.float32)
        x_true = x_true - jnp.mean(x_true)
        b = -st.weak_laplacian(g, x_true, specs)
        op = lambda x: -st.weak_laplacian(g, x, specs)
        vol = jnp.asarray(np.broadcast_to(g.vol, g.cell_shape), jnp.float32)
        vmean = lambda x: jnp.sum(x * vol) / jnp.sum(vol)

        def err(precision, refine_op=None):
            s = ShellPoissonFastDiag(g, dtype=jnp.float32,
                                     precision=precision,
                                     refine_op=refine_op)
            x, _ = s.solve(b)
            x = x - vmean(x) + vmean(x_true)
            return float(jnp.max(jnp.abs(x - x_true)))

        e_highest = err("highest")
        e_high = err("high")
        e_refine = err("high-refine", refine_op=op)
        scale = float(jnp.max(jnp.abs(x_true)))
        assert e_high < 5e-3 * scale           # one-pass bf16x3 bound
        assert e_refine < 3.0 * e_highest + 1e-5 * scale
        with pytest.raises(ValueError):
            ShellPoissonFastDiag(g, precision="high-refine")


class TestCuboidFastDiag:
    def test_exact_inverse_and_matches_direct(self):
        import jax.numpy as jnp
        from dycoreplanet_tpu.solvers.spectral import (
            CuboidPoissonDirect, CuboidPoissonFastDiag)

        g = make_cuboid(8, 12, 16)
        specs = [NEU, None, None]
        rng = np.random.RandomState(11)
        x_true = _mean_free(jnp.asarray(rng.randn(*g.cell_shape)))
        b = -st.weak_laplacian(g, x_true, specs)
        xf = _mean_free(CuboidPoissonFastDiag(g, dtype=jnp.float64)(b))
        np.testing.assert_allclose(np.asarray(xf), np.asarray(x_true),
                                   atol=1e-9)
        xd = _mean_free(CuboidPoissonDirect(g, dtype=jnp.float64)(b))
        np.testing.assert_allclose(np.asarray(xf), np.asarray(xd),
                                   atol=1e-9)

    def test_f32_accuracy(self):
        import jax.numpy as jnp
        from dycoreplanet_tpu.solvers.spectral import CuboidPoissonFastDiag

        g = make_cuboid(8, 16, 16)
        specs = [NEU, None, None]
        rng = np.random.RandomState(12)
        x_true = _mean_free(
            jnp.asarray(rng.randn(*g.cell_shape), dtype=jnp.float32))
        b = -st.weak_laplacian(g, x_true, specs)
        x = _mean_free(CuboidPoissonFastDiag(g, dtype=jnp.float32)(b))
        assert float(jnp.max(jnp.abs(x - x_true))) < 1e-4


class TestAnnulusFastDiag:
    def test_exact_inverse(self):
        import jax.numpy as jnp
        from dycoreplanet_tpu.solvers.spectral import AnnulusPoissonFastDiag

        g = make_annulus(16, 48, 1.0, 3.0)
        specs = [NEU, None]
        rng = np.random.RandomState(13)
        x_true = _mean_free(jnp.asarray(rng.randn(*g.cell_shape)))
        b = -st.weak_laplacian(g, x_true, specs)
        x = _mean_free(AnnulusPoissonFastDiag(g, dtype=jnp.float64)(b))
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_true),
                                   atol=1e-9)

    def test_thin_production_annulus(self):
        # aqua_planet.prm regime: extreme aspect ratio r in [637.1, 647.1]
        import jax.numpy as jnp
        from dycoreplanet_tpu.solvers.spectral import AnnulusPoissonFastDiag

        g = make_annulus(16, 192, 637.1, 647.1)
        specs = [NEU, None]
        rng = np.random.RandomState(14)
        x_true = _mean_free(jnp.asarray(rng.randn(*g.cell_shape)))
        b = -st.weak_laplacian(g, x_true, specs)
        x = _mean_free(AnnulusPoissonFastDiag(g, dtype=jnp.float64)(b))
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_true),
                                   atol=1e-7)


class TestFastDiagSelection:
    def test_selectors(self):
        import jax.numpy as jnp
        from dycoreplanet_tpu.solvers.spectral import (
            AnnulusPoissonFastDiag, CuboidPoissonFastDiag,
            make_poisson_solver)

        assert isinstance(make_poisson_solver(make_cuboid(4, 8, 8),
                                              dtype=jnp.float64),
                          CuboidPoissonFastDiag)
        assert isinstance(make_poisson_solver(make_annulus(4, 16, 1.0, 2.0),
                                              dtype=jnp.float64),
                          AnnulusPoissonFastDiag)
