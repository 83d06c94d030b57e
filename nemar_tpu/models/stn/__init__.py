"""STN registry (reference models/stn/__init__.py: define_stn dispatch)."""

from nemar_tpu.models.stn.affine_stn import AffineSTN
from nemar_tpu.models.stn.unet_stn import UnetSTN


def define_stn(opt, stn_type: str):
    """Dispatch affine vs unet STN from option flags (reference define_stn)."""
    # φ's input pair: (real_A, real_B) by default; (fake_B, real_B) with
    # --stn_field_source fake (both modality-B-shaped then)
    src_nc = (
        opt.output_nc
        if getattr(opt, "stn_field_source", "pair") == "fake"
        else opt.input_nc
    )
    nc = src_nc + opt.output_nc
    ac = getattr(opt, "stn_align_corners", False)
    wi = getattr(opt, "warp_impl", "auto")
    if getattr(opt, "mesh_spatial", 1) > 1 and wi in ("auto", "pallas"):
        # the Pallas warp kernel carries no sharding annotations; under a
        # spatially-sharded ('data','spatial') mesh GSPMD would have to
        # replicate it. The one-hot-matmul path is a plain einsum that GSPMD
        # shards (halo via collectives) — route to it.
        wi = "mm"
    if stn_type == "affine":
        return AffineSTN(
            in_channels=nc,
            ngf=getattr(opt, "stn_ngf", 32),
            padding_mode=getattr(opt, "stn_padding_mode", "zeros"),
            align_corners=ac,
            warp_impl=wi,
            head=getattr(opt, "stn_affine_head", "flatten"),
        )
    if stn_type == "unet":
        return UnetSTN(
            in_channels=nc,
            ngf=getattr(opt, "stn_ngf", 32),
            depth=getattr(opt, "stn_depth", 5),
            flow_scale=getattr(opt, "stn_flow_scale", 1.0),
            smooth_type=getattr(opt, "stn_smooth_type", "l1"),
            smooth_order=getattr(opt, "stn_smooth_order", 1),
            head_impl=getattr(opt, "stn_head_impl", "xla"),
            up_impl=getattr(opt, "stn_up_impl", "xla"),
            padding_mode=getattr(opt, "stn_padding_mode", "zeros"),
            bounded_flow=getattr(opt, "stn_bounded_flow", 0.0),
            align_corners=ac,
            warp_impl=wi,
            multiscale=getattr(opt, "stn_multiscale", False),
            level_scale=getattr(opt, "stn_level_scale", 1.0),
            head_min_res=getattr(opt, "stn_head_min_res", 0),
        )
    raise NotImplementedError(f"stn type {stn_type!r}")


__all__ = ["AffineSTN", "UnetSTN", "define_stn"]
