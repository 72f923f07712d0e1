from d3fields_tpu.fields.state import FieldState, state_from_obs
from d3fields_tpu.fields.fusion import eval_field, eval_dist, batch_eval, Fusion
