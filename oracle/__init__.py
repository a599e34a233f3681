"""Numpy float64 oracle — the trusted, slow ground truth.

The reference mount (/root/reference) is empty (SURVEY.md §0), so this
package re-derives the reference's numerical behavior from the published
pbrt-v3 hair-scattering specification (Chiang et al. 2016; pbrt.org/hair.pdf)
and the yocto-gl thin-line intersection model. Everything in the TPU
framework is tested `allclose` against this oracle, and pixel gradients are
validated against finite differences of it.

Corresponds to reference components (SURVEY.md §2):
  hair_bsdf.py  -> 2.8  [U:libs/yocto_extension/yocto_extension.{h,cpp}]
  geometry.py   -> 2.2  [U:libs/yocto/yocto_shape.h] (intersect_line)
  pathtrace.py  -> 2.7  [U:libs/yocto/yocto_trace.{h,cpp}] (trace_path, tiny)
"""
