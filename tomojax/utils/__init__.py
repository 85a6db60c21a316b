from tomojax.utils import io, config, profiling

__all__ = ["io", "config", "profiling"]
