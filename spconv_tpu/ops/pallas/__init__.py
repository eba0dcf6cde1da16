"""TPU Pallas kernels: the sorted-key (SK) one-hot family and the
dynamic-gather (DG) search+gather family."""
