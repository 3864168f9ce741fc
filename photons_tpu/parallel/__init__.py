from photons_tpu.parallel.step import ShardedSimulation, ShardedState, make_sharded_step

__all__ = ["ShardedSimulation", "ShardedState", "make_sharded_step"]
