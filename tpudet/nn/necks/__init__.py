"""Necks: FPN top-down, YOLO upsample-concat, RefineDet TCB, PFPNet MSCA, DLA-up."""
