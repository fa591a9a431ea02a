from nasa_niswan_tpu.train.config import TrainConfig, parse_args
from nasa_niswan_tpu.train.schedule import step_lr
from nasa_niswan_tpu.train.checkpoint import save_checkpoint, load_checkpoint
from nasa_niswan_tpu.train.loop import make_train_step, make_eval_step, fit
