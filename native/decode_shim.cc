// fvd_tpu native media decode shim.
//
// Role (SURVEY §2.4): the reference leans on ffmpeg/OpenCV subprocesses and
// per-frame seeks for every node that touches video (main.py:66-170,
// v1:93-183, v3:96, v4:137).  This shim decodes ONCE per video on the host:
// a single sequential pass fills a caller-provided contiguous RGB24 buffer
// (ready for one host->HBM transfer as uint8[T, H, W, 3]) and the audio
// stream is demuxed+resampled to float PCM without an ffmpeg binary.
//
// C ABI (ctypes-friendly), no exceptions across the boundary.
//
// Build: make -C native   (g++ + pkg-config libavformat/libavcodec/
// libavutil/libswscale/libswresample)

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/display.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
#include <libswscale/swscale.h>
}

#include <cmath>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Handle {
  AVFormatContext* fmt = nullptr;
  int video_stream = -1;
  int audio_stream = -1;
  AVCodecContext* vctx = nullptr;
  AVCodecContext* actx = nullptr;
  int64_t video_pos = 0;  // frames decoded so far (streaming chunked reads)
  bool video_flushed = false;
};

AVCodecContext* open_codec(AVFormatContext* fmt, int stream_idx) {
  AVStream* st = fmt->streams[stream_idx];
  const AVCodec* codec = avcodec_find_decoder(st->codecpar->codec_id);
  if (!codec) return nullptr;
  AVCodecContext* ctx = avcodec_alloc_context3(codec);
  if (!ctx) return nullptr;
  if (avcodec_parameters_to_context(ctx, st->codecpar) < 0 ||
      avcodec_open2(ctx, codec, nullptr) < 0) {
    avcodec_free_context(&ctx);
    return nullptr;
  }
  return ctx;
}

}  // namespace

extern "C" {

void* fvd_open(const char* path) {
  auto* h = new Handle();
  if (avformat_open_input(&h->fmt, path, nullptr, nullptr) < 0) {
    delete h;
    return nullptr;
  }
  if (avformat_find_stream_info(h->fmt, nullptr) < 0) {
    avformat_close_input(&h->fmt);
    delete h;
    return nullptr;
  }
  h->video_stream =
      av_find_best_stream(h->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  h->audio_stream =
      av_find_best_stream(h->fmt, AVMEDIA_TYPE_AUDIO, -1, -1, nullptr, 0);
  if (h->video_stream >= 0) h->vctx = open_codec(h->fmt, h->video_stream);
  if (h->audio_stream >= 0) h->actx = open_codec(h->fmt, h->audio_stream);
  if (!h->vctx && !h->actx) {
    avformat_close_input(&h->fmt);
    delete h;
    return nullptr;
  }
  return h;
}

void fvd_close(void* handle) {
  auto* h = static_cast<Handle*>(handle);
  if (!h) return;
  if (h->vctx) avcodec_free_context(&h->vctx);
  if (h->actx) avcodec_free_context(&h->actx);
  if (h->fmt) avformat_close_input(&h->fmt);
  delete h;
}

// Probe metadata. Returns 0 on success.
int fvd_probe(void* handle, double* fps, int64_t* frame_count, int* width,
              int* height, double* duration, int* has_audio) {
  auto* h = static_cast<Handle*>(handle);
  if (!h || h->video_stream < 0 || !h->vctx) return -1;
  AVStream* st = h->fmt->streams[h->video_stream];
  AVRational fr = st->avg_frame_rate.num ? st->avg_frame_rate : st->r_frame_rate;
  *fps = fr.den ? av_q2d(fr) : 0.0;
  *width = h->vctx->width;
  *height = h->vctx->height;
  *duration = h->fmt->duration > 0
                  ? static_cast<double>(h->fmt->duration) / AV_TIME_BASE
                  : 0.0;
  int64_t nb = st->nb_frames;
  if (nb <= 0 && *fps > 0 && *duration > 0)
    nb = static_cast<int64_t>(*duration * *fps + 0.5);
  *frame_count = nb;
  *has_audio = (h->audio_stream >= 0 && h->actx) ? 1 : 0;
  return 0;
}

// Container-level metadata the ingest node needs for reference parity
// (main.py:77-170 probes codec + rotation via ffprobe): display-matrix
// rotation in degrees [0, 360) and the decoder name ("h264", "av1", ...).
// Returns 0 on success.
int fvd_probe_extra(void* handle, int* rotation, char* codec_name,
                    int codec_name_len) {
  auto* h = static_cast<Handle*>(handle);
  if (!h || h->video_stream < 0) return -1;
  AVStream* st = h->fmt->streams[h->video_stream];

  double theta = 0.0;
  const uint8_t* dm =
      av_stream_get_side_data(st, AV_PKT_DATA_DISPLAYMATRIX, nullptr);
  if (dm)
    theta = -av_display_rotation_get(reinterpret_cast<const int32_t*>(dm));
  long r = std::lround(theta);
  *rotation = static_cast<int>(((r % 360) + 360) % 360);

  const char* name = avcodec_get_name(st->codecpar->codec_id);
  if (codec_name && codec_name_len > 0) {
    std::strncpy(codec_name, name ? name : "", codec_name_len - 1);
    codec_name[codec_name_len - 1] = '\0';
  }
  return 0;
}

// Sequential single-pass decode of the requested frame indices (sorted
// ascending).  out_rgb must hold n_ids * height * width * 3 bytes.
// Fills kept_ids (the indices actually decoded) and returns their count,
// or -1 on error.
int64_t fvd_read_frames(void* handle, const int64_t* frame_ids, int64_t n_ids,
                        uint8_t* out_rgb, int64_t* kept_ids) {
  auto* h = static_cast<Handle*>(handle);
  if (!h || !h->vctx) return -1;
  const int w = h->vctx->width, hgt = h->vctx->height;
  const int64_t frame_bytes = static_cast<int64_t>(w) * hgt * 3;

  SwsContext* sws =
      sws_getContext(w, hgt, h->vctx->pix_fmt, w, hgt, AV_PIX_FMT_RGB24,
                     SWS_BILINEAR, nullptr, nullptr, nullptr);
  if (!sws) return -1;

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  // streaming: continue from where the previous call stopped — ascending
  // frame_ids across calls read the file in ONE pass total
  int64_t next_want = 0;    // cursor into frame_ids
  int64_t kept = 0;

  auto deliver = [&](AVFrame* f) {
    while (next_want < n_ids && frame_ids[next_want] < h->video_pos) next_want++;
    if (next_want < n_ids && frame_ids[next_want] == h->video_pos) {
      uint8_t* dst[1] = {out_rgb + kept * frame_bytes};
      int dst_stride[1] = {w * 3};
      sws_scale(sws, f->data, f->linesize, 0, hgt, dst, dst_stride);
      kept_ids[kept++] = h->video_pos;
      next_want++;
    }
    h->video_pos++;
  };

  bool done = false;
  while (!done && !h->video_flushed && av_read_frame(h->fmt, pkt) >= 0) {
    if (pkt->stream_index == h->video_stream) {
      if (avcodec_send_packet(h->vctx, pkt) >= 0) {
        while (avcodec_receive_frame(h->vctx, frame) >= 0) {
          deliver(frame);
          if (next_want >= n_ids) { done = true; break; }
        }
      }
    }
    av_packet_unref(pkt);
  }
  // flush decoder once the container is exhausted
  if (!done && !h->video_flushed) {
    h->video_flushed = true;
    avcodec_send_packet(h->vctx, nullptr);
    while (avcodec_receive_frame(h->vctx, frame) >= 0) {
      deliver(frame);
      if (next_want >= n_ids) break;
    }
  }

  av_frame_free(&frame);
  av_packet_free(&pkt);
  sws_freeContext(sws);
  return kept;
}

// Decode + resample the audio track to mono float PCM at target_sr.
// Returns the number of samples written (<= max_samples), or -1.
int64_t fvd_extract_audio(void* handle, int target_sr, float* out,
                          int64_t max_samples) {
  auto* h = static_cast<Handle*>(handle);
  if (!h || !h->actx || h->audio_stream < 0) return -1;

  SwrContext* swr = nullptr;
  AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
  if (swr_alloc_set_opts2(&swr, &mono, AV_SAMPLE_FMT_FLT, target_sr,
                          &h->actx->ch_layout, h->actx->sample_fmt,
                          h->actx->sample_rate, 0, nullptr) < 0 ||
      swr_init(swr) < 0) {
    if (swr) swr_free(&swr);
    return -1;
  }

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int64_t written = 0;
  std::vector<float> tmp;

  auto drain = [&](AVFrame* f) {
    int out_cap = static_cast<int>(
        av_rescale_rnd(swr_get_delay(swr, h->actx->sample_rate) +
                           (f ? f->nb_samples : 0),
                       target_sr, h->actx->sample_rate, AV_ROUND_UP));
    if (out_cap <= 0) out_cap = 1024;
    tmp.resize(out_cap);
    uint8_t* outp[1] = {reinterpret_cast<uint8_t*>(tmp.data())};
    int got = swr_convert(swr, outp, out_cap,
                          f ? const_cast<const uint8_t**>(f->data) : nullptr,
                          f ? f->nb_samples : 0);
    if (got > 0) {
      int64_t take = std::min<int64_t>(got, max_samples - written);
      if (take > 0) {
        std::memcpy(out + written, tmp.data(), take * sizeof(float));
        written += take;
      }
    }
  };

  while (written < max_samples && av_read_frame(h->fmt, pkt) >= 0) {
    if (pkt->stream_index == h->audio_stream) {
      if (avcodec_send_packet(h->actx, pkt) >= 0) {
        while (avcodec_receive_frame(h->actx, frame) >= 0) drain(frame);
      }
    }
    av_packet_unref(pkt);
  }
  // flush decoder + resampler
  avcodec_send_packet(h->actx, nullptr);
  while (avcodec_receive_frame(h->actx, frame) >= 0) drain(frame);
  drain(nullptr);

  av_frame_free(&frame);
  av_packet_free(&pkt);
  swr_free(&swr);
  return written;
}

}  // extern "C"
