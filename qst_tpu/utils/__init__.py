from qst_tpu.utils.sync import synchronized

__all__ = ["synchronized"]
