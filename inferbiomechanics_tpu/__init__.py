"""inferbiomechanics_tpu: a TPU-native motion-to-physics framework.

Re-implements the capabilities of the InferBiomechanics reference
(training / eval / visualization pipeline that infers ground reaction
forces, centers of pressure, contact wrenches, and joint torques from
pure joint kinematics) as an idiomatic JAX/XLA/Pallas/pjit stack:

- ``data``:     B3D-TPU mmap subject store (docs/FORMAT.md), window
                enumeration, vectorized or on-demand featurization,
                prefetching loader, native C++ data plane bindings.
- ``ops``:      jitted loss/metric kernels, spatial (rigid-body) algebra,
                autodiff FK/ID skeleton kernels, fused Pallas MLP and
                encoder-layer kernels.
- ``models``:   feedforward MLP, GroundLink temporal CNN, transformer
                sequence regressor (flax/VPU/pallas encoders), DDPM
                diffusion denoiser, analytical physics baseline.
- ``loss``:     RegressionLossEvaluator-compatible metric engine +
                inverse-dynamics tau report.
- ``train``:    jit/pjit train + eval steps, optax optimizers, checkpoints
                with mid-epoch resume, HBM-resident / streaming / host
                data-placement tiers.
- ``parallel``: device-mesh construction, dp/tp sharding rules,
                multi-host-safe array placement.
- ``viz``:      dependency-free HTML5 viewer replacing NimbleGUI.
- ``cli``:      command-line entry points mirroring the reference's
                ``main.py {train,analyze,visualize,...}`` surface.
"""

__version__ = "0.1.0"
