"""lifelong_clip_tpu — a TPU-native online continual-learning framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the LifeLong-CLIP
reference (online class-incremental learning on Si-Blurry streams with a
frozen CLIP backbone and parameter-efficient tuning). The compute path is
pure-functional JAX over pytree parameters, jitted end to end and sharded
over a `jax.sharding.Mesh`; nothing here is a port of the reference's
PyTorch module graph.

Layout:
  models/    pure-functional CLIP towers + PEFT parameter trees
  ops/       Pallas/XLA kernels (attention, fused preprocessing, MoE dispatch)
  parallel/  device mesh + sharding rules (dp/tp over ICI)
  utils/     tokenizer, Si-Blurry stream, replay memory, metrics, schedules
  data/      dataset registry (torchvision-backed + synthetic)
  methods/   online CL methods (continual-clip, lora/adapter, ER, ...)
"""

__version__ = "0.1.0"
