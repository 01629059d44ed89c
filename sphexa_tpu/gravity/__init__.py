from sphexa_tpu.gravity.direct import direct_gravity
