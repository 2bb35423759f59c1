"""Dense batched factor-graph state and GBP message-passing kernels."""
