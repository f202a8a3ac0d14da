"""Device-side numeric kernels (pure JAX / Pallas).

Each module re-implements one hot-loop family of the reference package
(`romanimpreprocess`) as shape-static, branch-free, jittable TPU code:

- legendre:   Legendre-basis evaluation with linear extrapolation
- linearity:  linearity correction + fixed-iteration bisection inverse
- ipc:        spatially-varying 3x3 IPC convolution and Neumann inverse
- ramp:       Casertano weights, einsum jump detection, masked
              saturation-truncation ramp fitting
- saturation: per-group saturation flagging with backup + spatial grow
- refsub:     row/channel reference-pixel subtraction
- sky:        binning, smoothed histogram mode, 2D Legendre sky fit
- mask:       DQ bit-plane growing (boolean dilation)
- pink:       1/f ("pink") banding noise synthesis via FFT
"""
