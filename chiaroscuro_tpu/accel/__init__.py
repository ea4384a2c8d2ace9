from chiaroscuro_tpu.accel.dispatch import make_intersectors

__all__ = ["make_intersectors"]
