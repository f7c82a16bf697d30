from deepchem_tpu.parallel.mesh import (get_default_mesh, replicate,
                                        shard_batch_axis, mesh_context,
                                        device_count)
from deepchem_tpu.parallel.tp import (BERT_TP_RULES, GROVER_TP_RULES,
                                      HF_TP_RULES, get_mesh_2d,
                                      local_shard_shapes, param_specs,
                                      shard_batch, shard_params, spec_for)
from deepchem_tpu.parallel.pp import (get_pipeline_mesh, stack_stage_params,
                                      shard_pipeline_params, pipeline_apply,
                                      pipeline_loss_fn)
from deepchem_tpu.parallel.distributed import (init_distributed,
                                               global_mesh, process_shard,
                                               process_shard_indices)

__all__ = ['get_default_mesh', 'replicate', 'shard_batch_axis',
           'mesh_context', 'device_count', 'BERT_TP_RULES',
           'GROVER_TP_RULES', 'HF_TP_RULES', 'get_mesh_2d',
           'local_shard_shapes', 'param_specs', 'shard_batch',
           'shard_params', 'spec_for', 'get_pipeline_mesh',
           'stack_stage_params', 'shard_pipeline_params', 'pipeline_apply',
           'pipeline_loss_fn', 'init_distributed', 'global_mesh',
           'process_shard', 'process_shard_indices']
