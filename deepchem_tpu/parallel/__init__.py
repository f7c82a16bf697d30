from deepchem_tpu.parallel.mesh import (get_default_mesh, replicate,
                                        shard_batch_axis, mesh_context,
                                        device_count)

__all__ = ['get_default_mesh', 'replicate', 'shard_batch_axis',
           'mesh_context', 'device_count']
