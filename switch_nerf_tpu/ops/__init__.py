from switch_nerf_tpu.ops.encoding import (
    freq_encode,
    mip_encode,
    shifted_softplus,
    eval_sh,
)
from switch_nerf_tpu.ops.routing import (
    cumsum_sub_one,
    compute_sorted_location,
    load_balance,
    load_importance_loss,
    extract_critical,
    compute_capacity,
)
from switch_nerf_tpu.ops.dispatch import (
    build_dispatch_plan,
    dispatch,
    combine,
    dispatch_einsum_oracle,
    combine_einsum_oracle,
)
from switch_nerf_tpu.ops.volume import (
    volume_render,
    expand_and_perturb_z_vals,
    sample_pdf,
    sample_cdf,
    intersect_sphere,
    depth2pts_outside,
)
