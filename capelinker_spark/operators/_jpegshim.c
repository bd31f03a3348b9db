/* libjpeg-backed decode/encode shim for the multimodal operators.
 *
 * Compiled at runtime by _jpegnative.py (cc -O2 -shared -ljpeg), same
 * pattern as functions/_strdistc.c. This is the production fast path for
 * JPEG at scale; operators/media_jpeg.py is the dependency-free baseline
 * reference the tests cross-validate against.
 *
 * Error handling: libjpeg's default error_exit() calls exit() — replace it
 * with a setjmp/longjmp manager so a corrupt payload returns -1 instead of
 * killing the executor.
 */
#include <setjmp.h>
#include <stddef.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

struct err_mgr {
    struct jpeg_error_mgr pub;
    jmp_buf jb;
};

static void on_error(j_common_ptr cinfo) {
    struct err_mgr *e = (struct err_mgr *)cinfo->err;
    longjmp(e->jb, 1);
}

static void on_message(j_common_ptr cinfo) { (void)cinfo; /* silence */ }

/* Probe dimensions: returns 0 on success, -1 on error. */
int jpeg_probe(const unsigned char *buf, long len, int *w, int *h, int *ch) {
    struct jpeg_decompress_struct cinfo;
    struct err_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = on_error;
    jerr.pub.output_message = on_message;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, (unsigned char *)buf, (unsigned long)len);
    jpeg_read_header(&cinfo, TRUE);
    jpeg_calc_output_dimensions(&cinfo);
    *w = (int)cinfo.output_width;
    *h = (int)cinfo.output_height;
    *ch = cinfo.output_components;
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

/* Decode into caller buffer (h*w*ch bytes, RGB or grayscale as probed).
 * Returns 0 on success, -1 on error/overflow. */
int jpeg_decode(const unsigned char *buf, long len, unsigned char *out,
                long out_cap) {
    struct jpeg_decompress_struct cinfo;
    struct err_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = on_error;
    jerr.pub.output_message = on_message;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, (unsigned char *)buf, (unsigned long)len);
    jpeg_read_header(&cinfo, TRUE);
    jpeg_start_decompress(&cinfo);
    long stride = (long)cinfo.output_width * cinfo.output_components;
    if ((long)cinfo.output_height * stride > out_cap) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    while (cinfo.output_scanline < cinfo.output_height) {
        unsigned char *row = out + (long)cinfo.output_scanline * stride;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

/* Encode h*w*ch (ch = 1 gray or 3 RGB) into out; returns bytes written,
 * -1 on encode error, or -(needed bytes) when out_cap is too small (the
 * caller retries with a bigger buffer — needed is always > 1, so the two
 * negative cases cannot collide). subsample: 0 = 4:4:4, 1 = libjpeg
 * default (2x2 on Y => 4:2:0).
 * 'mem' is volatile: it is written between setjmp and a potential longjmp,
 * and the error path frees it — without volatile that read is UB (C11
 * 7.13.2.1) and a register-cached stale pointer would corrupt the heap. */
long jpeg_encode(const unsigned char *pix, int w, int h, int ch, int quality,
                 int subsample, unsigned char *out, long out_cap) {
    struct jpeg_compress_struct cinfo;
    struct err_mgr jerr;
    unsigned char *volatile mem = NULL;
    unsigned long mem_len = 0;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = on_error;
    jerr.pub.output_message = on_message;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_compress(&cinfo);
        if (mem) free((unsigned char *)mem);
        return -1;
    }
    jpeg_create_compress(&cinfo);
    jpeg_mem_dest(&cinfo, (unsigned char **)&mem, &mem_len);
    cinfo.image_width = (JDIMENSION)w;
    cinfo.image_height = (JDIMENSION)h;
    cinfo.input_components = ch;
    cinfo.in_color_space = ch == 1 ? JCS_GRAYSCALE : JCS_RGB;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, quality, TRUE);
    if (!subsample && ch == 3) {
        cinfo.comp_info[0].h_samp_factor = 1;
        cinfo.comp_info[0].v_samp_factor = 1;
    }
    jpeg_start_compress(&cinfo, TRUE);
    long stride = (long)w * ch;
    while (cinfo.next_scanline < cinfo.image_height) {
        unsigned char *row = (unsigned char *)pix +
                             (long)cinfo.next_scanline * stride;
        jpeg_write_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_compress(&cinfo);
    jpeg_destroy_compress(&cinfo);
    long n = (long)mem_len;
    if (n > out_cap) n = -n;  /* overflow: tell the caller the needed size */
    else memcpy(out, (unsigned char *)mem, mem_len);
    free((unsigned char *)mem);
    return n;
}
