"""Training engine: trainer loop, functional freezing, checkpoint I/O."""
