from .mesh import make_mesh, make_mesh_for_shape, state_sharding, factor_2d, replicated
from .launch import initialize, global_mesh
from .halo import make_halo_sweep, halo_roll
from .sharded import make_sharded_sweep, make_batched_sharded_sweep, shard_state, stack_states
