"""Live-webcam monocular demo (reference fork addition: /root/reference/myslam.cc)."""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.common import build_parser, make_system, save_outputs
from orbslam2_tpu.system import Sensor


def main():
    import cv2
    p = build_parser("Live monocular SLAM from a webcam")
    p.add_argument("--device", type=int, default=0)
    args = p.parse_args()
    system = make_system(args, Sensor.MONOCULAR)
    cap = cv2.VideoCapture(args.device)
    if not cap.isOpened():
        raise RuntimeError("cannot open camera")
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY).astype("float32")
            system.track_monocular(gray, time.time())
            if args.max_frames and system.tracker.frame_counter >= args.max_frames:
                break
    finally:
        cap.release()
        save_outputs(system, args)


if __name__ == "__main__":
    main()
