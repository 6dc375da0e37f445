"""Device mesh + sharding rules (TP/EP over ICI).

This layer replaces the reference's entire distribution stack — the
per-layer device placement (`-ngl`, /root/reference/src/backend.cpp:677-777),
the ggml_backend_sched graph partitioner, and the ggml-rpc TCP remote-device
protocol (/root/reference/ggml/src/ggml-rpc/ggml-rpc.cpp) — with one device
mesh and GSPMD sharding annotations: XLA owns placement and inserts ICI
collectives (SURVEY.md §2.7 P1/P2/P5 → TP done right).
"""
from .mesh import (make_mesh, shard_params, shard_cache, tp_param_sharding,
                   describe_devices)

__all__ = ["make_mesh", "shard_params", "shard_cache", "tp_param_sharding",
           "describe_devices"]
