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
    "EDGE_W",
    "EDGE_E",
    "EDGE_S",
    "EDGE_N",
]
