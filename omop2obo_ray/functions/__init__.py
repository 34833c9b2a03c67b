"""Pure, stateless kernels used inside ``map_batches`` stages."""
