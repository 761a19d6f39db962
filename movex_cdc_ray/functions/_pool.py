"""Actor-pool sizing: leave headroom so a pool never reserves every CPU and
starves the upstream read/transform stages (which deadlocks the streaming
executor on small sessions)."""

from __future__ import annotations


def pool_size(requested: int = 4) -> int:
    try:
        import ray

        cpus = int(ray.available_resources().get("CPU", 0)) or int(
            ray.cluster_resources().get("CPU", 4)
        )
    except Exception:  # noqa: BLE001 - sizing only
        cpus = 4
    return max(1, min(requested, cpus - 2))
