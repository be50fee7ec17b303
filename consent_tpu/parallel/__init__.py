"""Device-mesh parallelism: sharded window batches and fragment-axis
reduction (the framework's data/"tensor" parallel axes)."""
