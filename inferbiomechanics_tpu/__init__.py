"""inferbiomechanics_tpu: a TPU-native motion-to-physics framework.

Re-implements the capabilities of the InferBiomechanics reference
(training / eval / visualization pipeline that infers ground reaction
forces, centers of pressure, contact wrenches, and joint torques from
pure joint kinematics) as an idiomatic JAX/XLA/Pallas/pjit stack:

- ``data``:     host-side sharded .b3d-style subject store, window
                enumeration, vectorized featurization, prefetching loader.
- ``ops``:      jitted loss/metric kernels, spatial (rigid-body) algebra.
- ``models``:   feedforward MLP, GroundLink temporal CNN, transformer
                sequence regressor, DDPM diffusion denoiser, analytical
                physics baseline.
- ``loss``:     RegressionLossEvaluator-compatible metric engine.
- ``train``:    jit/pjit train + eval steps, optax optimizers, checkpoints.
- ``parallel``: device-mesh construction and sharding rules (dp over ICI).
- ``cli``:      command-line entry points mirroring the reference's
                ``main.py {train,analyze,visualize,...}`` surface.
"""

__version__ = "0.1.0"
