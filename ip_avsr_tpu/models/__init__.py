from ip_avsr_tpu.models import adenet, avnet, convae, encoder, zoo  # noqa: F401
