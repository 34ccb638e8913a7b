"""User-facing tools: render CLI and interactive viewer (SURVEY §2.6 / L4).

The reference's UI layer is UMG widgets + VR controllers
(`Widget/TransferFuncMenu.h:21-105`, `Widget/VolumeLoadMenu.h:26-80`,
`Actor/VR/VRMotionController.cpp:47-99`). The TPU-native equivalent is not a
1:1 port (SURVEY §2.6): the same *controls* — TF selection, window
center/width + cutoffs, volume load, camera orbit, clip plane, light
direction — exposed through a CLI (:mod:`.render_cli`) and a browser viewer
(:mod:`.viewer`).
"""
