from .dp import train_rbm_shard_map
from .mesh import make_mesh, make_mesh_2d
