"""Pure-JAX math ops: DDPM tables, C51 projection, DTW, n-step folding,
running statistics, exploration noise, schedules, embedding mixing."""
