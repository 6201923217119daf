

def stage_pool() -> tuple:
    """Autoscaling actor-pool bounds for compute stages: floor cpus//4 so
    the ramp doesn't dominate short stages, cap cpus-2 to leave slots for
    the read/consume operators (round 3 -- the previous fixed (1-2, 8) cap
    left 3/4 of a 32-cpu box idle in the signature stages). Shared by the
    dedup / text / similarity stages so a retune lands everywhere."""
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    return (max(1, cpus // 4), max(2, cpus - 2))
