from densebox_tpu.data.synthetic import synthetic_batch  # noqa: F401
