"""Device compute ops: math, RNG, intersection, BSDF, sky, tonemap, trace."""

from .vec import Vec3
from .scene_types import (DeviceScene, MaterialsSoA, PlanesSoA, SkyParams,
                          SpheresSoA, TrianglesSoA)
from .trace import CameraState, make_render_step, render_pass, trace_rays
