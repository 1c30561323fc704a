"""Multi-chip SPMD rendering: device mesh + shard_map over pixel bands."""

from .mesh import DP_AXIS, canvas_sharding, make_mesh, replicated
from .shard import make_sharded_canvas, make_sharded_render_step
