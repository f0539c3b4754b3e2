"""Brute-force O(n) intersector as an accel "backend".

The exactness oracle for LBVH property tests (SURVEY.md par.4.1: "the
brute-force intersector IS the mock") - thin wrappers over
pathtracer.kernels.intersect so accel backends share one interface.
"""

from __future__ import annotations

from pathtracer.kernels import intersect as isect


def make_brute_intersectors(v0, v1, v2):
    """Returns (intersect_fn, occluded_fn) closing over triangle arrays."""

    def intersect_fn(o, d, t_min, t_max):
        return isect.intersect_brute(o, d, v0, v1, v2, t_min, t_max)

    def occluded_fn(o, d, t_max):
        return isect.occluded_brute(o, d, t_max, v0, v1, v2)

    return intersect_fn, occluded_fn
