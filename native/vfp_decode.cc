// vfp_decode: native video decode worker (libavformat/libavcodec/libswscale).
//
// The reference outsources decode to the PyAV/cv2 wheels and then does
// resize/crop in Python per frame; this worker fuses demux -> decode ->
// scale(short side) -> center-crop into one C++ pass that never materializes
// a full-resolution RGB frame. It is the opt-in fast path behind the cv2
// default (data/decode.py), mirroring its semantics:
//   - vfp_decode_scan: every `skip`-th frame, short-side scaled to `size`
//     (SWS_AREA, matching cv2 INTER_AREA downscale) and center-cropped to
//     (size, size, 3) RGB24 — the attention scan path
//     (data/preprocess.py::resize_short_side_center_crop).
//   - vfp_decode_clip: contiguous frames from `start_frame` (pts-based seek),
//     center-cropped square then scaled (SWS_BILINEAR) — the 3D window path
//     (data/preprocess.py::square_center_crop_resize).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 vfp_decode.cc -o libvfp_decode.so \
//        -lavformat -lavcodec -lavutil -lswscale

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

namespace {

struct Demux {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  int stream_index = -1;

  ~Demux() {
    if (codec) avcodec_free_context(&codec);
    if (fmt) avformat_close_input(&fmt);
  }

  bool open(const char* path) {
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return false;
    if (avformat_find_stream_info(fmt, nullptr) < 0) return false;
    const AVCodec* dec = nullptr;
    stream_index =
        av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
    if (stream_index < 0 || !dec) return false;
    codec = avcodec_alloc_context3(dec);
    if (!codec) return false;
    if (avcodec_parameters_to_context(codec,
                                      fmt->streams[stream_index]->codecpar) < 0)
      return false;
    if (avcodec_open2(codec, dec, nullptr) < 0) return false;
    return true;
  }

  AVStream* stream() { return fmt->streams[stream_index]; }
};

// Iterate decoded frames; calls fn(frame, decode_index). fn returns false to
// stop. Returns false only on hard open/decode errors before any frame.
template <typename Fn>
bool for_each_frame(Demux& d, Fn&& fn) {
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int64_t index = 0;
  bool keep_going = true;
  while (keep_going && av_read_frame(d.fmt, pkt) >= 0) {
    if (pkt->stream_index == d.stream_index) {
      if (avcodec_send_packet(d.codec, pkt) >= 0) {
        while (keep_going && avcodec_receive_frame(d.codec, frame) >= 0) {
          keep_going = fn(frame, index++);
        }
      }
    }
    av_packet_unref(pkt);
  }
  if (keep_going) {  // drain
    avcodec_send_packet(d.codec, nullptr);
    while (keep_going && avcodec_receive_frame(d.codec, frame) >= 0) {
      keep_going = fn(frame, index++);
    }
  }
  av_frame_free(&frame);
  av_packet_free(&pkt);
  return true;
}

// Scale to short-side==size (AREA) then center-crop into out (size,size,3).
// The SwsContext cache is keyed on the full source signature (w, h, format)
// so mid-stream resolution/format switches rebuild it.
struct ShortSideScaler {
  SwsContext* sws = nullptr;
  std::vector<uint8_t> tmp;
  int nw = 0, nh = 0, size;
  int src_w = -1, src_h = -1, src_fmt = -1;

  explicit ShortSideScaler(int size) : size(size) {}
  ~ShortSideScaler() {
    if (sws) sws_freeContext(sws);
  }

  bool scale_crop(const AVFrame* f, uint8_t* out) {
    int h = f->height, w = f->width;
    int want_nw, want_nh;
    if (h < w) {
      want_nh = size;
      want_nw = (int)((int64_t)w * size / h);
    } else {
      want_nw = size;
      want_nh = (int)((int64_t)h * size / w);
    }
    if (!sws || w != src_w || h != src_h || f->format != src_fmt ||
        want_nw != nw || want_nh != nh) {
      if (sws) sws_freeContext(sws);
      nw = want_nw;
      nh = want_nh;
      src_w = w;
      src_h = h;
      src_fmt = f->format;
      sws = sws_getContext(w, h, (AVPixelFormat)f->format, nw, nh,
                           AV_PIX_FMT_RGB24, SWS_AREA, nullptr, nullptr,
                           nullptr);
      if (!sws) return false;
      tmp.resize((size_t)nw * nh * 3);
    }
    uint8_t* dst[1] = {tmp.data()};
    int dst_stride[1] = {nw * 3};
    sws_scale(sws, f->data, f->linesize, 0, h, dst, dst_stride);
    const int oy = (nh - size) / 2, ox = (nw - size) / 2;
    for (int y = 0; y < size; ++y) {
      std::memcpy(out + (size_t)y * size * 3,
                  tmp.data() + ((size_t)(y + oy) * nw + ox) * 3,
                  (size_t)size * 3);
    }
    return true;
  }
};

}  // namespace

extern "C" {

// Probe: total frames (0 if unknown), fps, dimensions. Returns 0 on success.
int vfp_decode_probe(const char* path, long long* total_frames, double* fps,
                     int* width, int* height) {
  Demux d;
  if (!d.open(path)) return -1;
  AVStream* st = d.stream();
  long long n = st->nb_frames;
  double rate = av_q2d(st->avg_frame_rate);
  if (n == 0 && st->duration > 0 && rate > 0) {
    n = (long long)(st->duration * av_q2d(st->time_base) * rate);
  }
  *total_frames = n;
  *fps = rate;
  *width = d.codec->width;
  *height = d.codec->height;
  return 0;
}

// Decode every `skip_rate`-th frame, fused short-side scale + center crop to
// (size, size, 3) RGB24 u8 per frame into `out` (max_frames slots).
// skip_rate <= 0 derives max(1, total // max_frames) from the stream (one
// open, no separate probe). Returns frames written, or -1 on open failure.
int vfp_decode_scan(const char* path, int max_frames, int skip_rate, int size,
                    uint8_t* out) {
  Demux d;
  if (!d.open(path)) return -1;
  if (skip_rate < 1) {
    AVStream* st = d.stream();
    long long total = st->nb_frames;
    double rate = av_q2d(st->avg_frame_rate);
    if (total == 0 && st->duration > 0 && rate > 0) {
      total = (long long)(st->duration * av_q2d(st->time_base) * rate);
    }
    skip_rate = (total > max_frames) ? (int)(total / max_frames) : 1;
    if (skip_rate < 1) skip_rate = 1;
  }
  ShortSideScaler scaler(size);
  int written = 0;
  const size_t frame_bytes = (size_t)size * size * 3;
  for_each_frame(d, [&](AVFrame* f, int64_t i) {
    if (i % skip_rate == 0) {
      if (!scaler.scale_crop(f, out + (size_t)written * frame_bytes))
        return false;
      if (++written >= max_frames) return false;
    }
    return true;
  });
  return written;
}

// Decode `num_frames` contiguous frames starting at `start_frame` (pts-based
// seek + discard), center-crop to square then scale to (size, size) with
// bilinear (the 3D window path). Returns frames written, or -1.
int vfp_decode_clip(const char* path, long long start_frame, int num_frames,
                    int size, uint8_t* out) {
  Demux d;
  if (!d.open(path)) return -1;
  AVStream* st = d.stream();
  double rate = av_q2d(st->avg_frame_rate);
  // frame pts are offset by the stream start_time (e.g. MPEG-TS captures)
  const int64_t start_pts =
      (st->start_time != AV_NOPTS_VALUE) ? st->start_time : 0;
  int64_t target_pts = start_pts;
  if (start_frame > 0 && rate > 0) {
    double seconds = (double)start_frame / rate;
    target_pts = start_pts + (int64_t)(seconds / av_q2d(st->time_base));
    av_seek_frame(d.fmt, d.stream_index, target_pts, AVSEEK_FLAG_BACKWARD);
    avcodec_flush_buffers(d.codec);
  }

  SwsContext* sws = nullptr;
  int written = 0;
  const size_t frame_bytes = (size_t)size * size * 3;
  int crop_w = 0, crop_h = 0, off_x = 0, off_y = 0;
  int src_w = -1, src_h = -1, src_fmt = -1;

  for_each_frame(d, [&](AVFrame* f, int64_t) {
    if (f->pts != AV_NOPTS_VALUE && f->pts < target_pts) return true;
    if (!sws || f->width != src_w || f->height != src_h ||
        f->format != src_fmt) {
      if (sws) sws_freeContext(sws);
      int h = f->height, w = f->width;
      int side = std::min(h, w);
      // even offsets keep chroma planes aligned for subsampled formats
      off_x = ((w - side) / 2) & ~1;
      off_y = ((h - side) / 2) & ~1;
      crop_w = side;
      crop_h = side;
      src_w = w;
      src_h = h;
      src_fmt = f->format;
      sws = sws_getContext(crop_w, crop_h, (AVPixelFormat)f->format, size,
                           size, AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr,
                           nullptr, nullptr);
      if (!sws) return false;
    }
    // Crop by plane pointer offset. The horizontal offset must be in BYTES:
    // per plane, samples may span several bytes (10-bit) or be interleaved
    // (packed RGB), so use the pixfmt descriptor's component step.
    const AVPixFmtDescriptor* desc =
        av_pix_fmt_desc_get((AVPixelFormat)f->format);
    const uint8_t* planes[4] = {nullptr, nullptr, nullptr, nullptr};
    for (int p = 0; p < 4 && f->data[p]; ++p) {
      int sx = (p == 1 || p == 2) ? desc->log2_chroma_w : 0;
      int sy = (p == 1 || p == 2) ? desc->log2_chroma_h : 0;
      int step = 1;  // bytes from one sample to the next within the plane
      for (int c = 0; c < desc->nb_components; ++c) {
        if (desc->comp[c].plane == p) step = std::max(step, desc->comp[c].step);
      }
      planes[p] = f->data[p] + (size_t)(off_y >> sy) * f->linesize[p] +
                  (size_t)(off_x >> sx) * step;
    }
    uint8_t* dst[1] = {out + (size_t)written * frame_bytes};
    int dst_stride[1] = {size * 3};
    sws_scale(sws, planes, f->linesize, 0, crop_h, dst, dst_stride);
    return ++written < num_frames;
  });
  if (sws) sws_freeContext(sws);
  return written;
}

}  // extern "C"
