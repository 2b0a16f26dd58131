from .core import (
    batchnorm,
    bn_init,
    conv2d,
    conv_init,
    is_bn_state,
    linear,
    linear_init,
    max_pool,
    relu,
    silu,
)
from .resnet import init_resnet, resnet_forward
from .pointnet import (
    init_pointnet,
    pointnet_forward,
    pointnet_forward_point_sharded,
)
from .pointnet_fused import pointnet_forward_fused
from .gcn import (
    init_modulated_gcn,
    modulated_gcn_forward,
    modulated_gconv,
    modulated_gconv_init,
)
from .embedders import (
    fc_head,
    fc_head_beta,
    init_fc_head,
    init_fc_head_beta,
    init_input_process,
    init_timestep_embedder,
    init_transl_enc,
    input_process,
    sinusoidal_table,
    timestep_embed,
    transl_enc,
)
