from .mesh import make_mesh, replicated, batch_sharded, shard_train_inputs, shard_batch_indices
