"""Pallas TPU kernels — the framework's hand-written native layer.

Equivalents of the reference's LAPACK FFI backends (SURVEY.md §2
"Native components checklist"), written against the TPU memory
hierarchy: VMEM-resident working sets, MXU GEMVs/GEMMs, VPU updates.
"""

from .qrcp import qrcp_panel, qrcp_panel_complex

__all__ = ["qrcp_panel", "qrcp_panel_complex"]
