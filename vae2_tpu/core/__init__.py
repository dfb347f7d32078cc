"""Training engine: losses, train state, jitted step functions, loops."""
