"""MultiConfiguration, ML wrappers, and GlassExpert tests
(reference: optiland/multiconfig/, ml/wrappers.py,
optimization/optimizer/scipy/glass_expert.py)."""

from __future__ import annotations

import numpy as np
import pytest

from optiland_tpu.optic import Optic


def singlet():
    o = Optic()
    o.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
    o.surfaces.add(index=1, radius=40.0, thickness=5.0, material="N-BK7",
                   is_stop=True)
    o.surfaces.add(index=2, radius=-40.0, thickness=30.0)
    o.surfaces.add(index=3)
    o.set_aperture("EPD", 8.0)
    o.fields.set_type("angle")
    o.fields.add(y=0)
    o.wavelengths.add(0.55, is_primary=True)
    return o


class TestMultiConfiguration:
    def test_linked_property_propagates(self):
        from optiland_tpu.multiconfig import MultiConfiguration

        mc = MultiConfiguration(singlet())
        cfg1 = mc.add_configuration()
        mc.set_radius(1, 38.0, "all")
        assert mc.configurations[0].surfaces.surfaces[1].radius == 38.0
        assert cfg1.surfaces.surfaces[1].radius == 38.0

    def test_zoom_override_breaks_link(self):
        from optiland_tpu.multiconfig import MultiConfiguration

        mc = MultiConfiguration(singlet())
        cfg1 = mc.add_configuration()
        mc.set_thickness(2, 45.0, [1])
        assert mc.configurations[0].surfaces.surfaces[2].thickness == 30.0
        assert cfg1.surfaces.surfaces[2].thickness == 45.0
        # a later shared change still propagates other attributes...
        mc.set_radius(2, -42.0, "all")
        assert cfg1.surfaces.surfaces[2].radius == -42.0
        # ...and the override survives
        assert cfg1.surfaces.surfaces[2].thickness == 45.0

    def test_material_override(self):
        from optiland_tpu.multiconfig import MultiConfiguration

        mc = MultiConfiguration(singlet())
        cfg1 = mc.add_configuration()
        mc.set_material(1, "SF11", [1])
        assert cfg1.surfaces.surfaces[1].material == "SF11"
        assert mc.configurations[0].surfaces.surfaces[1].material == "N-BK7"

    def test_configs_trace_independently(self):
        from optiland_tpu.multiconfig import MultiConfiguration

        mc = MultiConfiguration(singlet())
        cfg1 = mc.add_configuration()
        mc.set_radius(1, 30.0, [1])
        f0 = float(np.ravel(mc.configurations[0].paraxial.f2())[0])
        f1 = float(np.ravel(cfg1.paraxial.f2())[0])
        assert abs(f0 - f1) > 1.0


class TestMLWrappers:
    def _problem(self):
        from optiland_tpu.optimization import OptimizationProblem

        lens = singlet()
        p = OptimizationProblem(lens)
        p.add_operand("f2", target=42.0, weight=1.0)
        p.add_variable(lens, "radius", surface_number=1)
        return lens, p

    def test_jax_loss(self):
        from optiland_tpu.ml import jax_loss

        _, p = self._problem()
        fn, x0 = jax_loss(p)
        v = float(fn(x0))
        assert np.isfinite(v) and v > 0

    def test_torch_module_trains(self):
        torch = pytest.importorskip("torch")
        from optiland_tpu.ml import OpticalSystemModule

        lens, p = self._problem()
        mod = OpticalSystemModule(lens, p)
        opt = torch.optim.Adam(mod.parameters(), lr=5e-3)
        l0 = None
        for _ in range(40):
            opt.zero_grad()
            loss = mod()
            if l0 is None:
                l0 = float(loss)
            loss.backward()
            opt.step()
            mod.apply_bounds()
        assert float(loss) < l0
        mod.sync_to_problem()
        f2 = float(np.ravel(lens.paraxial.f2())[0])
        assert abs(f2 - 42.0) < abs(
            39.3 - 42.0
        )  # moved toward the target from ~39.3


class TestGlassExpert:
    def test_glass_substitution_improves_merit(self):
        from optiland_tpu.optimization import (
            GlassExpert,
            OptimizationProblem,
        )

        lens = singlet()
        p = OptimizationProblem(lens)
        p.add_operand("f2", target=100.0, weight=1.0)
        p.add_variable(lens, "radius", surface_number=1)
        p.add_variable(lens, "material", surface_number=1,
                       glass_selection=["N-BK7", "SF11", "N-SK16", "LF5"])
        assert len(p.glass_variables) == 1
        initial = float(p.sum_squared())
        ge = GlassExpert(p)
        res = ge.run(num_neighbours=3, maxiter=25, verbose=False)
        assert float(res.fun) <= initial + 1e-9
        assert p.glass_variables[0].value in (
            "N-BK7", "SF11", "N-SK16", "LF5"
        )

    def test_material_variable_updates_optic(self):
        from optiland_tpu.optimization.variables import MaterialVariable

        lens = singlet()
        var = MaterialVariable(lens, surface_number=1,
                               glass_selection=["N-BK7", "SF11"])
        assert var.value == "N-BK7"
        f_before = float(np.ravel(lens.paraxial.f2())[0])
        var.update("SF11")
        assert var.value == "SF11"
        f_after = float(np.ravel(lens.paraxial.f2())[0])
        assert abs(f_before - f_after) > 1.0


class TestGlassUtils:
    def test_get_nd_vd(self):
        from optiland_tpu.materials.glass_utils import get_nd_vd

        nd, vd = get_nd_vd("N-BK7")
        assert abs(nd - 1.5168) < 5e-3
        assert abs(vd - 64.17) < 1.0

    def test_downsample_and_neighbours(self):
        from optiland_tpu.materials.glass_utils import (
            downsample_glass_map,
            get_neighbour_glasses,
        )

        glasses = ["N-BK7", "SF11", "N-SK16", "LF5", "SF5", "N-LAK22"]
        from optiland_tpu.materials.glass_utils import get_nd_vd

        gd = {g: get_nd_vd(g) for g in glasses}
        kept = downsample_glass_map(gd, 3)
        assert 2 <= len(kept) <= 3
        nb = get_neighbour_glasses("N-BK7", glass_dict=gd, num_neighbours=2)
        assert len(nb) == 2 and "N-BK7" not in nb
