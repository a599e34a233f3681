"""yhair_tpu — a TPU-native differentiable hair path tracer.

A from-scratch JAX/Pallas framework replicating the capabilities of the
dsforza96/yocto-hair reference renderer (see SURVEY.md): the pbrt-v3 hair
BSDF, thin-strand geometry, a BVH-accelerated wavefront path integrator,
device-mesh sharding, and render/inverse-render/bench apps.

Layer map (mirrors SURVEY.md §1 onto TPU idioms):
  core/        math, RNG, camera, scene pytrees          (ref L1, L6a)
  geometry/    ray-segment & Bezier strand intersection  (ref L2)
  accel/       BVH build (host) + traversal (device)     (ref L3)
  bsdf/        hair BSDF eval/sample/pdf + diffuse       (ref L5)
  integrator/  wavefront path tracer, lights, MIS        (ref L4)
  ops/         Pallas TPU kernels for the hot paths      (ref: hot loops)
  parallel/    mesh sharding, collectives, multi-host    (ref: thread pool)
  io/          PLY / .hair / JSON scene / image IO       (ref L6a)
  apps/        render / invert / bench CLIs              (ref L6b)
"""

__version__ = "0.1.0"
