from esvio_tpu.solver import window, factors, gauss_newton, marginalization  # noqa: F401
