"""Pallas TPU kernels for the hot stencil paths (VMEM-resident red-black
SOR sweeps, fused projection steps). Kernels transparently fall back to
interpret mode off-TPU so the CPU test suite exercises them too."""
