"""Integrator accuracy vs an independent numpy oracle (not self-regression).

tests/oracle_ref.py re-implements the reference's EXACT estimator (quirks
semantics) scalar-path-at-a-time in numpy, sharing only the counter-based
RNG. Agreement at equal spp pins every formula in integrator/path.py
(estimator structure, NEE scheme, BSDF sampling, MIS, RR) against a second
derivation - the BASELINE "RMSE <= 1e-3 at equal spp" accuracy bar.
"""

import numpy as np
import pytest

from pathtracer.config import RenderConfig
from pathtracer.integrator.camera import Camera
from pathtracer.render import render_frame
from pathtracer.scene.procedural import cornell_box
from tests.oracle_ref import render_oracle


def _check(cfg, materials_suite, min_mean):
    """Per-pixel agreement with <=2% branch-boundary outliers.

    A path whose sample sits exactly on a branch boundary (grazing shadow
    ray, RR threshold, lobe pick) can flip under f32 reassociation between
    XLA and numpy, moving its whole contribution between estimator terms -
    one flipped path at 8x8/4spp shifts one pixel by ~0.04. Those flips are
    rounding, not estimator error, so assert: all but a few pixels agree to
    1e-3 RMSE, and flips stay rare.
    """
    scene = cornell_box(materials_suite=materials_suite).finalize()
    cam = Camera(position=(0.5, 0.5, 2.2))
    cam.look_at((0.5, 0.5, 0.0))
    img = np.asarray(render_frame(scene, cfg, cam.state(), 0))
    ora = render_oracle(scene, cfg, cam.state())
    assert img.mean() > min_mean     # actually lit
    per_pixel = np.abs(img - ora).max(axis=-1)
    outliers = per_pixel > 1e-3
    assert outliers.mean() <= 0.02, (
        f"{outliers.sum()} / {outliers.size} pixels off vs oracle; "
        f"max {per_pixel.max()}")
    inliers = ~outliers
    rmse = float(np.sqrt(np.mean((img[inliers] - ora[inliers]) ** 2)))
    assert rmse <= 1e-3, f"inlier RMSE vs oracle {rmse}"


def test_quirks_estimator_matches_oracle_diffuse():
    cfg = RenderConfig(width=8, height=8, spp=4, max_depth=4,
                       reference_quirks=True, intersector="brute")
    _check(cfg, materials_suite=False, min_mean=0.1)


def test_quirks_estimator_matches_oracle_materials_rr():
    # GGX metal + dielectric spheres, depth 6 => Russian roulette exercised
    cfg = RenderConfig(width=8, height=8, spp=2, max_depth=6,
                       reference_quirks=True, intersector="brute")
    _check(cfg, materials_suite=True, min_mean=0.05)


@pytest.mark.slow
def test_quirks_oracle_32px_16spp():
    """VERDICT r2 item 7: the accuracy bar at 32x32 with 16 spp.

    ~16k paths through the scalar numpy oracle (minutes) - marked slow;
    run explicitly with `pytest -m slow tests/test_oracle.py`. Results
    recorded in BASELINE.md's accuracy addendum.
    """
    cfg = RenderConfig(width=32, height=32, spp=16, max_depth=4,
                       reference_quirks=True, intersector="brute")
    _check(cfg, materials_suite=False, min_mean=0.1)
