from .mesh import make_reads_mesh, sharded_call_step
