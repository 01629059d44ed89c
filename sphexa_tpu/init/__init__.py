from sphexa_tpu.init.factory import make_initializer, available_cases
