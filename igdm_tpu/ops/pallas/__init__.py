from igdm_tpu.ops.pallas.fused_groupnorm_silu import fused_groupnorm_silu

__all__ = ["fused_groupnorm_silu"]
