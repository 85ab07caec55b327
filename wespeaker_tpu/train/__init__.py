from wespeaker_tpu.train.train_step import (  # noqa: F401
    AugConfig,
    TrainState,
    init_train_state,
    make_eval_embed_fn,
    make_train_step,
)
