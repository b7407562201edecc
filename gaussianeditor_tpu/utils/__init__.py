from gaussianeditor_tpu.utils.masks import dilate_mask, erode_mask, fill_closed_areas
