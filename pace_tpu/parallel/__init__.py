from .topology import (
    Topology,
    EdgeRelation,
    cubed_sphere_topology,
    doubly_periodic_topology,
    cube_surface_point,
    cube_face_frames,
    EDGE_W,
    EDGE_E,
    EDGE_S,
    EDGE_N,
)
from .partitioner import TilePartitioner, CubedSpherePartitioner
from .halo import HaloExchanger
from .gather import gather_tiles, scatter_tiles

__all__ = [
    "Topology",
    "EdgeRelation",
    "cubed_sphere_topology",
    "doubly_periodic_topology",
    "cube_surface_point",
    "cube_face_frames",
    "TilePartitioner",
    "CubedSpherePartitioner",
    "HaloExchanger",
    "gather_tiles",
    "scatter_tiles",
    "EDGE_W",
    "EDGE_E",
    "EDGE_S",
    "EDGE_N",
]
