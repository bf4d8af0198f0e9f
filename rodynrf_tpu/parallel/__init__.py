from .mesh import make_mesh, replicated, batch_sharded, shard_train_inputs, shard_batch_indices
from .multihost import global_batch_from_local, global_mesh, process_span
