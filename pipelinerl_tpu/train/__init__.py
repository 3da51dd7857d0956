"""Training internals: RL losses, advantages, packing, optimizers, loops."""
