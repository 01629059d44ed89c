from sphexa_tpu.io.hdf5 import HDF5Writer, HDF5Reader, save_checkpoint, load_checkpoint
