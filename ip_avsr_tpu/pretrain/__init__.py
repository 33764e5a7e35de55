from ip_avsr_tpu.pretrain import dbn, finetune, rbm, unfold  # noqa: F401
