from .mesh import make_mesh, shard_network, sharded_forward, sharded_train_step, param_specs
