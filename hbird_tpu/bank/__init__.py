from hbird_tpu.bank.io import save_memory, load_memory

__all__ = ["save_memory", "load_memory"]
