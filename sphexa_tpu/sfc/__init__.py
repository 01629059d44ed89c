from sphexa_tpu.sfc.box import (Box, Boundary, apply_pbc, put_in_box,
                                distance_pbc, normalize_coords)
from sphexa_tpu.sfc.morton import morton_encode, morton_decode
from sphexa_tpu.sfc.hilbert import hilbert_encode, hilbert_decode
