# Parity: /root/reference/configs/yolo/yolov3_d53_mstrain-608_273e_coco.py
# canonical YOLOv3 608 recipe — the repo's yolov3_d53_coco base
_base_ = './yolov3_d53_coco.py'
