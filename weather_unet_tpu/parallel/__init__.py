"""Mesh / sharding utilities for data-parallel training over ICI."""

from weather_unet_tpu.parallel.mesh import (
    make_mesh, batch_sharding, replicated_sharding, shard_batch, MeshPlan,
)
