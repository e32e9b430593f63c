// Native IO hot path for the host data loader.
//
// The reference framework's input pipeline ran inside tf.data's C++
// runtime (tensortools/input.py drove TFRecordDataset + decode ops);
// this library is the rebuild's native equivalent: TFRecord framing +
// minimal tf.train.Example wire parsing + libpng/libjpeg decode,
// writing decoded image+label planes directly into the caller's batch
// stack, with an internal thread pool (no Python/GIL per example).
//
// Exposed via ctypes (semanticsegmentationactivelearning_tpu/data/native.py).
//
// Build: make -C csrc   (produces csrc/libssal_io.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

extern "C" {

// ---------------------------------------------------------------------------
// CRC32C (Castagnoli), slicing-by-8
// ---------------------------------------------------------------------------

static uint32_t crc_table[8][256];
static bool crc_init_done = false;

static void crc_init() {
  if (crc_init_done) return;
  for (uint32_t i = 0; i < 256; i++) {
    uint32_t crc = i;
    for (int j = 0; j < 8; j++)
      crc = (crc >> 1) ^ (0x82F63B78u & (~(crc & 1) + 1));
    crc_table[0][i] = crc;
  }
  for (uint32_t i = 0; i < 256; i++) {
    uint32_t crc = crc_table[0][i];
    for (int s = 1; s < 8; s++) {
      crc = crc_table[0][crc & 0xFF] ^ (crc >> 8);
      crc_table[s][i] = crc;
    }
  }
  crc_init_done = true;
}

uint32_t ssal_crc32c(const uint8_t* data, size_t len) {
  crc_init();
  uint32_t crc = 0xFFFFFFFFu;
  while (len >= 8) {
    uint64_t word;
    memcpy(&word, data, 8);
    word ^= crc;
    crc = crc_table[7][word & 0xFF] ^ crc_table[6][(word >> 8) & 0xFF] ^
          crc_table[5][(word >> 16) & 0xFF] ^
          crc_table[4][(word >> 24) & 0xFF] ^
          crc_table[3][(word >> 32) & 0xFF] ^
          crc_table[2][(word >> 40) & 0xFF] ^
          crc_table[1][(word >> 48) & 0xFF] ^
          crc_table[0][(word >> 56) & 0xFF];
    data += 8;
    len -= 8;
  }
  while (len--) crc = crc_table[0][(crc ^ *data++) & 0xFF] ^ (crc >> 8);
  return crc ^ 0xFFFFFFFFu;
}

uint32_t ssal_masked_crc32c(const uint8_t* data, size_t len) {
  uint32_t crc = ssal_crc32c(data, len);
  return ((crc >> 15) | (crc << 17)) + 0xA282EAD8u;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// TFRecord framing + Example wire scanning
// ---------------------------------------------------------------------------

namespace {

struct Bytes {
  const uint8_t* p = nullptr;
  size_t len = 0;
};

// Read the first framed record of a .tfrecord file into buf.
// The 64-bit length field is untrusted input: validate it against the
// actual file size (and its masked CRC) before allocating, so a
// corrupt/truncated file reports an error instead of throwing
// bad_alloc inside a worker thread (which would std::terminate).
static bool read_record(const char* path, std::vector<uint8_t>* buf,
                        std::string* err) {
  FILE* fp = fopen(path, "rb");
  if (!fp) {
    *err = std::string("open failed: ") + path;
    return false;
  }
  if (fseek(fp, 0, SEEK_END) != 0) {
    fclose(fp);
    *err = std::string("seek failed: ") + path;
    return false;
  }
  long fsize = ftell(fp);
  rewind(fp);
  uint8_t header[12];
  if (fsize < 12 || fread(header, 1, 12, fp) != 12) {
    fclose(fp);
    *err = std::string("truncated header: ") + path;
    return false;
  }
  uint64_t length;
  memcpy(&length, header, 8);  // little-endian host assumed (x86/ARM)
  // Framing: u64 length + u32 masked-crc(length) + data + u32
  // masked-crc(data); the file must hold at least the data + its CRC.
  if (ssal_masked_crc32c(header, 8) !=
      (uint32_t)(header[8] | header[9] << 8 | header[10] << 16 |
                 (uint32_t)header[11] << 24)) {
    fclose(fp);
    *err = std::string("corrupt length CRC: ") + path;
    return false;
  }
  if (length > (uint64_t)fsize - 12 - 4) {
    fclose(fp);
    *err = std::string("record length exceeds file size: ") + path;
    return false;
  }
  buf->resize(length);
  size_t got = fread(buf->data(), 1, length, fp);
  fclose(fp);
  if (got != length) {
    *err = std::string("truncated body: ") + path;
    return false;
  }
  return true;
}

static uint64_t read_varint(const uint8_t*& p, const uint8_t* end) {
  uint64_t v = 0;
  int shift = 0;
  while (p < end) {
    uint8_t b = *p++;
    v |= uint64_t(b & 0x7F) << shift;
    if (!(b & 0x80)) break;
    shift += 7;
  }
  return v;
}

// Scan an Example proto for the value of feature `key`.
// Supports BytesList (returns bytes) and Int64List (returns value).
struct FeatureHit {
  bool found = false;
  Bytes bytes;       // first BytesList entry
  int64_t int_val = -1;  // first Int64List entry
};

static void scan_fields(const uint8_t* p, const uint8_t* end,
                        const char* key, size_t keylen, FeatureHit* hit);

// Bounds-checked cursor advance: every varint-declared length is
// untrusted and must be clamped to the enclosing buffer, otherwise a
// corrupt record walks the scanner past the allocation (OOB read).
static bool advance(const uint8_t*& p, const uint8_t* end, uint64_t len) {
  if (len > (uint64_t)(end - p)) return false;
  p += len;
  return true;
}

// Parse one Feature message body (oneof bytes_list=1 / int64_list=3).
static void parse_feature(const uint8_t* p, const uint8_t* end,
                          FeatureHit* hit) {
  while (p < end) {
    uint64_t tag = read_varint(p, end);
    uint32_t field = tag >> 3, wire = tag & 7;
    if (wire == 2) {
      uint64_t len = read_varint(p, end);
      const uint8_t* sub = p;
      if (!advance(p, end, len)) return;
      const uint8_t* sub_end = sub + len;
      if (field == 1) {  // BytesList
        while (sub < sub_end) {
          uint64_t t2 = read_varint(sub, sub_end);
          if ((t2 & 7) == 2) {
            uint64_t l2 = read_varint(sub, sub_end);
            const uint8_t* val = sub;
            if (!advance(sub, sub_end, l2)) return;
            if ((t2 >> 3) == 1 && !hit->found) {
              hit->found = true;
              hit->bytes = {val, (size_t)l2};
            }
          } else {
            read_varint(sub, sub_end);
          }
        }
      } else if (field == 3) {  // Int64List (packed or not)
        while (sub < sub_end) {
          uint64_t t2 = read_varint(sub, sub_end);
          uint32_t w2 = t2 & 7;
          if (w2 == 2) {  // packed
            uint64_t l2 = read_varint(sub, sub_end);
            const uint8_t* pk = sub;
            if (!advance(sub, sub_end, l2)) return;
            const uint8_t* pk_end = pk + l2;
            if (pk < pk_end && !hit->found) {
              hit->found = true;
              hit->int_val = (int64_t)read_varint(pk, pk_end);
            }
          } else if (w2 == 0) {
            uint64_t v = read_varint(sub, sub_end);
            if (!hit->found) {
              hit->found = true;
              hit->int_val = (int64_t)v;
            }
          }
        }
      }
    } else if (wire == 0) {
      read_varint(p, end);
    } else if (wire == 5) {
      if (!advance(p, end, 4)) return;
    } else if (wire == 1) {
      if (!advance(p, end, 8)) return;
    } else {
      break;
    }
  }
}

// Walk Example -> Features(field 1) -> map entries, matching `key`.
static void scan_fields(const uint8_t* p, const uint8_t* end,
                        const char* key, size_t keylen, FeatureHit* hit) {
  // Example message: field 1 = Features
  while (p < end && !hit->found) {
    uint64_t tag = read_varint(p, end);
    if ((tag & 7) != 2) {  // skip non-length-delimited
      if ((tag & 7) == 0) read_varint(p, end);
      else if ((tag & 7) == 5) { if (!advance(p, end, 4)) return; }
      else if ((tag & 7) == 1) { if (!advance(p, end, 8)) return; }
      else return;
      continue;
    }
    uint64_t len = read_varint(p, end);
    const uint8_t* feats = p;
    if (!advance(p, end, len)) return;
    const uint8_t* feats_end = feats + len;
    if ((tag >> 3) != 1) continue;
    // Features: repeated map entry (field 1)
    const uint8_t* q = feats;
    while (q < feats_end && !hit->found) {
      uint64_t t2 = read_varint(q, feats_end);
      if ((t2 & 7) != 2) {
        if ((t2 & 7) == 0) read_varint(q, feats_end);
        else break;
        continue;
      }
      uint64_t l2 = read_varint(q, feats_end);
      const uint8_t* entry = q;
      if (!advance(q, feats_end, l2)) return;
      const uint8_t* entry_end = entry + l2;
      // MapEntry: key=1 (string), value=2 (Feature)
      const uint8_t* ekey = nullptr;
      size_t ekey_len = 0;
      const uint8_t* eval = nullptr;
      size_t eval_len = 0;
      const uint8_t* r = entry;
      while (r < entry_end) {
        uint64_t t3 = read_varint(r, entry_end);
        if ((t3 & 7) != 2) {
          if ((t3 & 7) == 0) read_varint(r, entry_end);
          else break;
          continue;
        }
        uint64_t l3 = read_varint(r, entry_end);
        const uint8_t* val = r;
        if (!advance(r, entry_end, l3)) return;
        if ((t3 >> 3) == 1) {
          ekey = val;
          ekey_len = l3;
        } else if ((t3 >> 3) == 2) {
          eval = val;
          eval_len = l3;
        }
      }
      if (ekey && eval && ekey_len == keylen &&
          memcmp(ekey, key, keylen) == 0) {
        parse_feature(eval, eval + eval_len, hit);
      }
    }
  }
}

static FeatureHit find_feature(const std::vector<uint8_t>& record,
                               const char* key) {
  FeatureHit hit;
  scan_fields(record.data(), record.data() + record.size(), key,
              strlen(key), &hit);
  return hit;
}

// ---------------------------------------------------------------------------
// Image decoding
// ---------------------------------------------------------------------------

// Decode PNG bytes; out gets h*w*channels uint8 (channels = 1 or 3,
// chosen by want_channels; palette/gray expansion handled by libpng).
static bool decode_png(const uint8_t* data, size_t len, int want_channels,
                       std::vector<uint8_t>* out, int* h, int* w,
                       std::string* err) {
  png_image image;
  memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&image, data, len)) {
    *err = "png header parse failed";
    return false;
  }
  image.format = (want_channels == 1) ? PNG_FORMAT_GRAY : PNG_FORMAT_RGB;
  *h = image.height;
  *w = image.width;
  out->resize(PNG_IMAGE_SIZE(image));
  if (!png_image_finish_read(&image, nullptr, out->data(), 0, nullptr)) {
    *err = "png decode failed";
    return false;
  }
  return true;
}

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

static bool decode_jpeg(const uint8_t* data, size_t len, int want_channels,
                        std::vector<uint8_t>* out, int* h, int* w,
                        std::string* err) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    *err = "jpeg decode failed";
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = (want_channels == 1) ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *h = cinfo.output_height;
  *w = cinfo.output_width;
  int stride = cinfo.output_width * cinfo.output_components;
  out->resize((size_t)(*h) * stride);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + (size_t)cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

static bool decode_image(const uint8_t* data, size_t len, int want_channels,
                         std::vector<uint8_t>* out, int* h, int* w,
                         std::string* err) {
  if (len >= 8 && data[0] == 0x89 && data[1] == 'P')
    return decode_png(data, len, want_channels, out, h, w, err);
  if (len >= 3 && data[0] == 0xFF && data[1] == 0xD8)
    return decode_jpeg(data, len, want_channels, out, h, w, err);
  *err = "unknown image format";
  return false;
}

// ---------------------------------------------------------------------------
// Example loading into the caller's stack buffer
// ---------------------------------------------------------------------------

static bool load_one(const char* path, uint8_t* slot, int storage_h,
                     int storage_w, int channels, int fill_label,
                     int* out_h, int* out_w, int* has_label,
                     std::string* err) {
  std::vector<uint8_t> record;
  if (!read_record(path, &record, err)) return false;

  FeatureHit img = find_feature(record, "image/data");
  if (!img.found) {
    *err = std::string("no image/data in ") + path;
    return false;
  }
  std::vector<uint8_t> pixels;
  int ih = 0, iw = 0;
  if (!decode_image(img.bytes.p, img.bytes.len, channels, &pixels, &ih,
                    &iw, err))
    return false;

  const int stride = channels + 1;
  // prefill: zeros for image channels, fill_label for the label plane
  for (size_t i = 0; i < (size_t)storage_h * storage_w; i++) {
    memset(slot + i * stride, 0, channels);
    slot[i * stride + channels] = (uint8_t)fill_label;
  }
  int ch = ih < storage_h ? ih : storage_h;
  int cw = iw < storage_w ? iw : storage_w;
  for (int y = 0; y < ch; y++) {
    const uint8_t* src = pixels.data() + (size_t)y * iw * channels;
    uint8_t* dst = slot + (size_t)y * storage_w * stride;
    for (int x = 0; x < cw; x++)
      memcpy(dst + (size_t)x * stride, src + (size_t)x * channels,
             channels);
  }
  *out_h = ch;
  *out_w = cw;

  FeatureHit lbl = find_feature(record, "label");
  *has_label = 0;
  if (lbl.found && lbl.bytes.len > 0) {
    std::vector<uint8_t> lpix;
    int lh = 0, lw = 0;
    if (!decode_image(lbl.bytes.p, lbl.bytes.len, 1, &lpix, &lh, &lw,
                      err))
      return false;
    int lch = lh < storage_h ? lh : storage_h;
    int lcw = lw < storage_w ? lw : storage_w;
    for (int y = 0; y < lch; y++) {
      const uint8_t* src = lpix.data() + (size_t)y * lw;
      uint8_t* dst = slot + (size_t)y * storage_w * stride + channels;
      for (int x = 0; x < lcw; x++) dst[(size_t)x * stride] = src[x];
    }
    *has_label = 1;
  }
  return true;
}

// ---------------------------------------------------------------------------
// PNG encoding (prediction-map writer for the inference CLI)
// ---------------------------------------------------------------------------

// Encode one [h, w, channels] uint8 array (channels 1 or 3) straight to
// a PNG file. The reference wrote prediction PNGs in-graph via
// tf.io.write_file (inference.py:111-119); this is the native host
// equivalent, called off the serving hot loop so encode+disk overlap
// device compute.
static bool write_png_one(const char* path, const uint8_t* data, int h,
                          int w, int channels, std::string* err) {
  png_image image;
  memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  image.width = (png_uint_32)w;
  image.height = (png_uint_32)h;
  image.format = (channels == 1) ? PNG_FORMAT_GRAY : PNG_FORMAT_RGB;
  if (!png_image_write_to_file(&image, path, 0, data,
                               w * channels /* row_stride */, nullptr)) {
    *err = std::string("png encode failed: ") + path + ": " +
           image.message;
    return false;
  }
  return true;
}

}  // namespace

extern "C" {

// Threaded batch encode of a contiguous [n, h, w, channels] uint8
// stack; paths[i] == NULL skips slot i (padded/invalid tail entries
// stay in the stack so the caller never re-packs). Returns 0 on
// success, else the 1-based index of the first failing slot.
int ssal_write_png_batch(const char** paths, const uint8_t* data, int n,
                         int h, int w, int channels, int num_threads,
                         char* err, size_t errlen) {
  const size_t slot_size = (size_t)h * w * channels;
  std::vector<std::string> errors(n);
  std::vector<int> status(n, 0);
  if (num_threads < 1) num_threads = 1;
  if (num_threads > n) num_threads = n;

  auto worker = [&](int tid) {
    for (int i = tid; i < n; i += num_threads) {
      if (!paths[i]) continue;
      std::string e;
      if (!write_png_one(paths[i], data + (size_t)i * slot_size, h, w,
                         channels, &e)) {
        errors[i] = e;
        status[i] = 1;
      }
    }
  };
  std::vector<std::thread> threads;
  for (int t = 1; t < num_threads; t++) threads.emplace_back(worker, t);
  worker(0);
  for (auto& th : threads) th.join();

  for (int i = 0; i < n; i++) {
    if (status[i]) {
      snprintf(err, errlen, "%s", errors[i].c_str());
      return i + 1;
    }
  }
  return 0;
}

// Load one record into a [storage_h, storage_w, channels+1] uint8 slot.
// Returns 0 on success; on failure fills `err` (errlen bytes).
int ssal_load_example(const char* path, uint8_t* slot, int storage_h,
                      int storage_w, int channels, int fill_label,
                      int* out_h, int* out_w, int* has_label, char* err,
                      size_t errlen) {
  std::string e;
  if (!load_one(path, slot, storage_h, storage_w, channels, fill_label,
                out_h, out_w, has_label, &e)) {
    snprintf(err, errlen, "%s", e.c_str());
    return 1;
  }
  return 0;
}

// Threaded batch load into a [n, storage_h, storage_w, channels+1]
// uint8 stack. Returns 0 on success, else the 1-based index of the
// first failing example (err describes it).
int ssal_load_batch(const char** paths, int n, uint8_t* stack,
                    int storage_h, int storage_w, int channels,
                    int fill_label, int* heights, int* widths,
                    int* has_label, int num_threads, char* err,
                    size_t errlen) {
  const size_t slot_size =
      (size_t)storage_h * storage_w * (channels + 1);
  std::vector<std::string> errors(n);
  std::vector<int> status(n, 0);
  if (num_threads < 1) num_threads = 1;
  if (num_threads > n) num_threads = n;

  auto worker = [&](int tid) {
    for (int i = tid; i < n; i += num_threads) {
      std::string e;
      if (!load_one(paths[i], stack + (size_t)i * slot_size, storage_h,
                    storage_w, channels, fill_label, &heights[i],
                    &widths[i], &has_label[i], &e)) {
        errors[i] = e;
        status[i] = 1;
      }
    }
  };
  std::vector<std::thread> threads;
  for (int t = 1; t < num_threads; t++) threads.emplace_back(worker, t);
  worker(0);
  for (auto& th : threads) th.join();

  for (int i = 0; i < n; i++) {
    if (status[i]) {
      snprintf(err, errlen, "%s", errors[i].c_str());
      return i + 1;
    }
  }
  return 0;
}

}  // extern "C"
