"""Force the CPU backend with 8 virtual devices BEFORE any jax use.

This is the reference's seam-substitution test pattern (SURVEY.md §4):
difacto tests distributed logic in one process by swapping StoreLocal for
StoreDist; we run the identical SPMD programs on a virtual 8-device CPU
mesh. (Env-var based forcing — JAX_PLATFORMS — is ignored when the axon
TPU plugin is installed, hence the programmatic config.)
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
