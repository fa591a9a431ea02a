from nasa_niswan_tpu.utils.logging import LoggerDecorator, run_logger
from nasa_niswan_tpu.utils.seeding import seed_rng
from nasa_niswan_tpu.utils.cache import enable_compilation_cache
