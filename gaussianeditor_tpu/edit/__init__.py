from gaussianeditor_tpu.edit.tracing import update_mask_from_views
from gaussianeditor_tpu.edit.edit_system import EditConfig, EditSystem
from gaussianeditor_tpu.edit.del_system import DelConfig, DelSystem
from gaussianeditor_tpu.edit.add_system import AddConfig, AddSystem
