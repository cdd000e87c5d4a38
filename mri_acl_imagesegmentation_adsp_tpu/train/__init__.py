"""Training stack: losses, metrics, jitted engine, trainer, loggers."""
